"""CLI mode coverage: magic-div self-test, stdin-driven (outmeta-style)
decode, and interactive encode — compared against the oracle binaries,
which are driven through the same stdin protocol."""
import ctypes as ct
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
