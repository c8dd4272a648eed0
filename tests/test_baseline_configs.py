"""BASELINE.json config coverage.

Config [0] (16^3 generic C f64 @1e-16) runs always; the larger configs
run under WR_SLOW=1 (kept out of the default suite's time budget).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from conftest import ORACLE, smooth_field
from test_generic_cli import make_c_file, make_fortran_file, \
    run_ours_enc, run_ours_dec

slow = pytest.mark.skipif(os.environ.get("WR_SLOW") != "1",
                          reason="set WR_SLOW=1 for large configs")


def test_config0_16cubed_f64_1e16(oracle, tmp_path):
    """configs[0]: generic wrenc/wrdec 16^3 f64 C file @1e-16 — full
    bit-exact round trip vs the reference binaries."""
    nz = ny = nx = 16
    a = np.fromfunction(
        lambda k, j, i: 10 * np.sin(i / 16) * np.sin(j / 16) ** 2
        * np.cos(k / 16), (nz, ny, nx))
    for d in ("o", "m"):
        dd = tmp_path / d
        dd.mkdir()
        make_c_file(dd / "data.bin", [(a, 8)])
    args = ["data.bin", "data.wrb", "data.wrh", "2", "0", "1", "2",
            "16", "16", "16", "1e-16"]
    subprocess.run([str(ORACLE / "wrenc"), *args], cwd=tmp_path / "o",
                   check=True, capture_output=True)
    run_ours_enc(args, tmp_path / "m")
    assert (tmp_path / "m" / "data.wrb").read_bytes() == \
        (tmp_path / "o" / "data.wrb").read_bytes()
    assert (tmp_path / "m" / "data.wrh").read_text() == \
        (tmp_path / "o" / "data.wrh").read_text()
    # survey appendix golden: 24021 bytes under the reference's stock
    # contract=fast build; the ISO-semantics build yields 24023 (last
    # layers differ in low bits). Size must match the oracle exactly and
    # stay in that envelope.
    size = (tmp_path / "m" / "data.wrb").stat().st_size
    assert size == (tmp_path / "o" / "data.wrb").stat().st_size
    assert 23900 <= size <= 24100
    dargs = ["data.wrb", "data.wrh", "datarec.bin", "2", "0"]
    subprocess.run([str(ORACLE / "wrdec"), *dargs], cwd=tmp_path / "o",
                   check=True, capture_output=True)
    run_ours_dec(dargs, tmp_path / "m")
    assert (tmp_path / "m" / "datarec.bin").read_bytes() == \
        (tmp_path / "o" / "datarec.bin").read_bytes()


@slow
def test_config1_256cubed_f32_3fields(oracle, tmp_path):
    """configs[1]: 256^3 f32, 3 velocity fields, Fortran sequential
    4-byte records, tol 1e-5."""
    n = 256
    rng = np.random.default_rng(0)
    i = np.arange(n)
    base = (10 * np.cos(i / 23.7)[:, None, None]
            * np.sin(i / 11.1)[None, :, None] ** 2
            * np.sin(i / 17.3)[None, None, :])
    fields = [(base * (1 + 0.2 * k)
               + 0.01 * rng.standard_normal((n, n, n)), 4)
              for k in range(3)]
    for d in ("o", "m"):
        dd = tmp_path / d
        dd.mkdir()
        make_fortran_file(dd / "data.bin", fields, mlen=4)
    args = ["data.bin", "data.wrb", "data.wrh", "0", "0", "3", "1",
            str(n), str(n), str(n), "1e-5"]
    subprocess.run([str(ORACLE / "wrenc"), *args], cwd=tmp_path / "o",
                   check=True, capture_output=True)
    run_ours_enc(args, tmp_path / "m")
    assert (tmp_path / "m" / "data.wrb").read_bytes() == \
        (tmp_path / "o" / "data.wrb").read_bytes()
    dargs = ["data.wrb", "data.wrh", "datarec.bin", "0", "0"]
    subprocess.run([str(ORACLE / "wrdec"), *dargs], cwd=tmp_path / "o",
                   check=True, capture_output=True)
    run_ours_dec(dargs, tmp_path / "m")
    assert (tmp_path / "m" / "datarec.bin").read_bytes() == \
        (tmp_path / "o" / "datarec.bin").read_bytes()


@slow
def test_config3_mssg_divided_multiproc(oracle, tmp_path):
    """configs[3]: MSSG backup-divided across 4 PROCIDs at 128^2x64 —
    run through the sharded mesh machinery as well as the CLI."""
    from test_mssg import make_backup, run_oracle, run_ours, cmp_file
    from waverange_tpu.cli import mssg_enc, mssg_dec
    for d in ("o", "m"):
        dd = tmp_path / d
        dd.mkdir()
        make_backup(dd, nx=128, ny=128, nz=64, nprocx=2, nprocy=2,
                    ndset=3)
    for procid in range(4):
        args = ["rst", ".enc", "2", "2", "1", "1e-5", str(procid)]
        run_oracle("wrmssgenc", args, tmp_path / "o")
        run_ours(mssg_enc, args, tmp_path / "m")
        cmp_file(tmp_path / "m" / f"rst_f{procid:04d}.enc",
                 tmp_path / "o" / f"rst_f{procid:04d}.enc")
