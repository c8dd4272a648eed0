"""CLI mode coverage: magic-div self-test, stdin-driven (outmeta-style)
decode, and interactive encode — compared against the oracle binaries,
which are driven through the same stdin protocol."""
import ctypes as ct
import pytest
import subprocess

import numpy as np

from waverange_tpu.native.build import ensure_built

from conftest import ORACLE, smooth_field
from test_generic_cli import make_c_file


def test_magicdiv_selftest():
    lib = ct.CDLL(str(ensure_built()))
    assert lib.wrn_selftest_magicdiv() == 0


def test_stdin_decode_matches_oracle(oracle, tmp_path):
    """wrdec fed via stdin (the reference examples' `wrdec < outmeta`)."""
    a = smooth_field((12, 10, 8))
    for d in ("o", "m"):
        dd = tmp_path / d
        dd.mkdir()
        make_c_file(dd / "data.bin", [(a, 8)])
    args = ["data.bin", "data.wrb", "data.wrh", "2", "0", "1", "2",
            "8", "10", "12", "1e-6"]
    subprocess.run([str(ORACLE / "wrenc"), *args], cwd=tmp_path / "o",
                   check=True, capture_output=True)
    import os
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(ORACLE.parent.parent) + ":"
                         + env.get("PYTHONPATH", ""))
    subprocess.run([sys.executable, "-m", "waverange_tpu.cli.wrenc",
                    *args], cwd=tmp_path / "m", check=True,
                   capture_output=True, env=env)
    outmeta = "data.wrb\ndata.wrh\ndatarec.bin\n2\n0\n"
    subprocess.run([str(ORACLE / "wrdec")], cwd=tmp_path / "o",
                   input=outmeta, text=True, check=True,
                   capture_output=True)
    subprocess.run([sys.executable, "-m", "waverange_tpu.cli.wrdec"],
                   cwd=tmp_path / "m", input=outmeta, text=True,
                   check=True, capture_output=True, env=env)
    assert (tmp_path / "m" / "datarec.bin").read_bytes() == \
        (tmp_path / "o" / "datarec.bin").read_bytes()


def test_header_field_mismatch_raises(tmp_path):
    """Decoder errors out when the header's field id doesn't match
    (reference throws std::exception — gen_aux.cpp:567)."""
    import shutil
    from pathlib import Path
    from waverange_tpu.io.generic import decode_generic_file
    G = Path(__file__).parent / "golden"
    wrh = (G / "data.wrh").read_text()
    # corrupt the per-field id line (first line after the ' -----' marker)
    lines = wrh.splitlines()
    idx = lines.index(" -----") + 1
    lines[idx] = "7"
    (tmp_path / "bad.wrh").write_text("\n".join(lines) + "\n")
    shutil.copy(G / "data.wrb", tmp_path / "data.wrb")
    with pytest.raises(ValueError, match="header"):
        decode_generic_file(str(tmp_path / "data.wrb"),
                            str(tmp_path / "bad.wrh"),
                            str(tmp_path / "out.bin"), 2, False,
                            verbose=False)


def test_truncated_payload_raises(tmp_path):
    import shutil
    from pathlib import Path
    from waverange_tpu.io.generic import decode_generic_file
    G = Path(__file__).parent / "golden"
    shutil.copy(G / "data.wrh", tmp_path / "data.wrh")
    (tmp_path / "data.wrb").write_bytes(
        (G / "data.wrb").read_bytes()[:100])
    with pytest.raises(Exception):
        decode_generic_file(str(tmp_path / "data.wrb"),
                            str(tmp_path / "data.wrh"),
                            str(tmp_path / "out.bin"), 2, False,
                            verbose=False)
