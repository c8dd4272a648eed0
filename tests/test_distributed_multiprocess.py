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
import pytest

from waverange_tpu import native as wn

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


WORKER_TRANSFORM = textwrap.dedent("""
    import os, sys
    port, pid, nproc, outdir = sys.argv[1], int(sys.argv[2]), \\
        int(sys.argv[3]), sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    sys.path.insert(0, sys.argv[5])
    from waverange_tpu.parallel.mesh import (distributed_encode_step,
                                             distributed_decode_step)

    shape = (32, 16, 16)   # nz % (2*8) == 0, even through 4 levels
    fld = np.fromfunction(
        lambda k, j, i: np.sin(i / 3.1) * np.cos(j / 5.2)
        + 0.1 * np.sin(k / 7.3) + 1e-3 * np.cos(i * j / 11.0), shape)
    mesh = Mesh(np.array(jax.devices()), ("d",))
    sh = NamedSharding(mesh, P("d"))
    slabs = jax.make_array_from_callback(shape, sh,
                                         lambda idx: fld[idx])
    step = distributed_encode_step(mesh, shape)
    planes, deps, minv, nlay, tolabs, midval, halfspan, trivial = step(
        slabs, 1e-6)
    # replicate the global sharded outputs to every host
    planes_h = multihost_utils.process_allgather(planes, tiled=True)
    # nlay/deps/minv are replicated (P()) -> read the local shard
    nlay_h = int(np.asarray(nlay.addressable_data(0)))
    deps_h = np.asarray(deps.addressable_data(0))
    minv_h = np.asarray(minv.addressable_data(0))

    # decode side across the same 2-process mesh
    dstep = distributed_decode_step(mesh, shape)
    pl_sh = jax.make_array_from_callback(
        planes_h.shape, NamedSharding(mesh, P(None, "d")),
        lambda idx: planes_h[idx])
    rec = dstep(pl_sh[:nlay_h], jnp.asarray(deps_h[:nlay_h]),
                jnp.asarray(minv_h[:nlay_h]))
    rec_h = np.asarray(multihost_utils.process_allgather(rec,
                                                         tiled=True))
    if pid == 0:
        np.save(os.path.join(outdir, "planes.npy"),
                np.asarray(planes_h)[:nlay_h])
        np.save(os.path.join(outdir, "meta.npy"),
                np.array([nlay_h, float(tolabs)], dtype=np.float64))
        np.save(os.path.join(outdir, "rec.npy"), rec_h)
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
    def field(i):
        return np.fromfunction(
            lambda k, j, x: np.sin(x / (3.1 + i)) * np.cos(j / 5.2)
            + 0.1 * i * np.sin(k / 7.3), (24, 20, 16))

    serial = b"".join(
        wn.encode_field(field(i), wtflag=1,
                        cutoff=np.array([1e-8]))["data"]
        for i in range(6))
    assert (tmp_path / "gathered.bin").read_bytes() == serial


@pytest.mark.slow
def test_two_process_distributed_transform(tmp_path):
    """distributed_encode_step/decode_step across 2 processes x 4
    devices: the cross-host DCN semantics of the all_to_all/ppermute
    wavelet (VERDICT r2 item 5 — dryrun_multichip can't see this). The
    8-device global planes must equal the single-process encode step's,
    and the distributed decode must reproduce the single-device decode
    to codegen rounding."""
    wfile = tmp_path / "worker.py"
    wfile.write_text(WORKER_TRANSFORM)
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
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
        assert "WORKER_OK" in out

    # single-process oracle (this pytest process, CPU backend)
    import jax.numpy as jnp
    from waverange_tpu.core import codec
    from waverange_tpu.ops.quant import decode_step

    shape = (32, 16, 16)
    fld = np.fromfunction(
        lambda k, j, i: np.sin(i / 3.1) * np.cos(j / 5.2)
        + 0.1 * np.sin(k / 7.3) + 1e-3 * np.cos(i * j / 11.0), shape)
    single = codec.encode_field(fld, 1e-6, backend="jax")
    meta = np.load(tmp_path / "meta.npy")
    planes = np.load(tmp_path / "planes.npy")
    rec = np.load(tmp_path / "rec.npy")
    assert int(meta[0]) == single.nlay
    assert meta[1] == pytest.approx(single.tolabs, rel=1e-12)
    pn = wn.decode_planes_batch(single.data,
                                single.len_enc_vec[:single.nlay],
                                fld.size)
    assert np.array_equal(planes, pn), \
        f"{int((planes != pn).sum())} symbol diffs vs single-process"
    # distributed decode matches the single-device decode to codegen
    # rounding (the sharded and unsharded XLA programs contract FMAs
    # differently on CPU; same bound as test_parallel's single-process
    # 8-device assertion) and satisfies the round-trip error contract.
    rec1 = np.asarray(decode_step(
        jnp.asarray(pn), jnp.asarray(single.deps_vec[:single.nlay]),
        jnp.asarray(single.minval_vec[:single.nlay]),
        shape=shape, levels=4))
    assert np.abs(rec - rec1).max() <= 1e-13 * max(np.abs(rec1).max(), 1.0)
    assert np.abs(rec - fld).max() <= 1.3e-6 * np.abs(fld).max()
