"""Real multi-process jax.distributed execution (VERDICT r1 item 3).

Launches 2 OS processes on the CPU backend with a localhost coordinator,
runs the BASELINE config[3] analog (MSSG-divided style: fields sharded
across processes by id), exchanges the variable-length encoded streams
with ``gather_streams_ordered`` (the real ``multihost_utils`` path, not
the single-process degenerate case), and byte-compares the rank-0
ordered concatenation against a serial encode of the same fields.

Reference analog: one process per PROCID file plus ordered append
(/root/reference/examples/mssg/divided/all_enc_dec.sh:4-11,
mssg_enc.cpp:457-470).
"""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    port, pid, nproc, outdir = sys.argv[1], int(sys.argv[2]), \\
        int(sys.argv[3]), sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    sys.path.insert(0, sys.argv[5])  # repo root
    from waverange_tpu import native as wn
    from waverange_tpu.parallel.distributed import gather_streams_ordered

    # 6 fields, deterministic; this process encodes ids [pid::nproc]
    # (interleaved so the ordered gather must actually reorder).
    def field(i):
        return np.fromfunction(
            lambda k, j, x: np.sin(x / (3.1 + i)) * np.cos(j / 5.2)
            + 0.1 * i * np.sin(k / 7.3), (24, 20, 16))

    ids = list(range(pid, 6, nproc))
    streams = [wn.encode_field(field(i), wtflag=1,
                               cutoff=np.array([1e-8]))["data"]
               for i in ids]
    ordered = gather_streams_ordered(streams, ids)
    if pid == 0:
        assert len(ordered) == 6
        with open(os.path.join(outdir, "gathered.bin"), "wb") as f:
            for s in ordered:
                f.write(s)
    else:
        assert ordered == []
    jax.distributed.shutdown()
    print("WORKER_OK", pid)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_ordered(tmp_path):
    wfile = tmp_path / "worker.py"
    wfile.write_text(WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(wfile), str(port), str(pid), "2",
             str(tmp_path), str(REPO)],
            cwd=tmp_path, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
        assert "WORKER_OK" in out

    # serial oracle: same fields encoded in id order by one process
    from waverange_tpu import native as wn

    def field(i):
        return np.fromfunction(
            lambda k, j, x: np.sin(x / (3.1 + i)) * np.cos(j / 5.2)
            + 0.1 * i * np.sin(k / 7.3), (24, 20, 16))

    serial = b"".join(
        wn.encode_field(field(i), wtflag=1,
                        cutoff=np.array([1e-8]))["data"]
        for i in range(6))
    assert (tmp_path / "gathered.bin").read_bytes() == serial
