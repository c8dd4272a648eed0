"""Benchmark: encode throughput of waverange_tpu vs the reference wrenc.

Headline config (BASELINE.json): 512^3 float64 CFD-like field, tol 1e-16
(near-lossless). Prints ONE JSON line to stdout:
  {"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": x}
where vs_baseline is our aggregate encode throughput divided by the
locally built reference wrenc's throughput on the same data and machine.

Pipelines measured (details on stderr):
  * tpu-hybrid — device wavelet+quantize (divided z-slabs, double-
    buffered against the host), host thread-parallel range coder;
  * native — the C++ host pipeline (conformance path).

Env knobs: WR_BENCH_N (default 512), WR_BENCH_TOL (1e-16),
WR_BENCH_SKIP_REF=1 skips the reference baseline run.
"""
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_field(n):
    log(f"generating {n}^3 f64 field...")
    t0 = time.time()
    i = np.arange(n)
    sx = np.sin(i / 17.3)
    sy = np.sin(i / 11.1) ** 2
    sz = np.cos(i / 23.7)
    fld = (10.0 * sz[:, None, None] * sy[None, :, None] * sx[None, None, :])
    rng = np.random.default_rng(0)
    # band-limited "turbulence": smooth noise at two scales
    small = rng.standard_normal((n // 8, n // 8, n // 8))
    small = np.repeat(np.repeat(np.repeat(small, 8, 0), 8, 1), 8, 2)
    fld += 0.05 * small
    # f32 noise (cast on add): halves generation time, same character
    fld += 1e-4 * rng.standard_normal((n, n, n), dtype=np.float32)
    log(f"  field ready in {time.time()-t0:.1f}s")
    return fld


def bench_native(fld, tol, reps=3, coder=0):
    """Best-of-N: this VM suffers multi-second CPU-steal bursts, so the
    minimum is the closest estimate of true capability."""
    from waverange_tpu import native as wn

    enc_t = dec_t = float("inf")
    for _ in range(reps):
        t0 = time.time()
        meta = wn.encode_field(fld, wtflag=1, cutoff=np.array([tol]),
                               coder=coder)
        enc_t = min(enc_t, time.time() - t0)
        t0 = time.time()
        rec = wn.decode_field(meta, fld.shape, coder=coder)
        dec_t = min(dec_t, time.time() - t0)
    err = float(np.abs(rec - fld).max())
    return dict(encode_s=enc_t, decode_s=dec_t, nbytes_in=fld.nbytes,
                nbytes_out=meta["ntot_enc"], err=err, nlay=meta["nlay"])


def bench_tpu_hybrid(fld, tol, n_blocks=8):
    """Divided-mode pipeline: device computes slab k+1 while the host
    range-codes slab k's layer planes."""
    import jax
    import jax.numpy as jnp
    from waverange_tpu import native as wn
    from waverange_tpu.ops.quant import _encode_step_impl

    nz = fld.shape[0]
    assert nz % n_blocks == 0
    slabs = np.split(fld, n_blocks, axis=0)
    dtype = jnp.float64
    consts = (jnp.asarray(tol, dtype), jnp.asarray(1.75, dtype),
              jnp.asarray(255.0, dtype))

    from functools import partial
    step = jax.jit(partial(_encode_step_impl, wtflag=True, levels=4))

    # Warm-up: compile AND exercise the device->host transfer path (the
    # first download through the axon tunnel sets up a transfer program
    # that can take minutes; subsequent transfers run at full speed).
    # A watchdog abandons the TPU path if warm-up exceeds the budget.
    budget = float(os.environ.get("WR_BENCH_TPU_WARMUP_S", "420"))
    log(f"  compiling device step + warming transfer path "
        f"(budget {budget:.0f}s)...")
    done = []

    def _warm():
        wout = step(jnp.zeros(slabs[0].shape, dtype), *consts)
        _ = np.asarray(wout[0])
        _ = [np.asarray(w) for w in wout[1:]]
        done.append(True)

    import threading
    wt = threading.Thread(target=_warm, daemon=True)
    wt.start()
    wt.join(budget)
    if not done:
        raise TimeoutError(f"device warm-up exceeded {budget:.0f}s "
                           "(tunnel transfer-program setup)")

    pool = ThreadPoolExecutor(max_workers=1)
    results = [None] * n_blocks

    def host_side(k, planes, deps, minv, nlay, tolabs, mid, half, triv):
        nlay = int(nlay)
        planes_np = np.asarray(planes[:nlay])
        payload, lens = wn.encode_planes_batch(planes_np)
        results[k] = (payload, lens, np.asarray(deps[:nlay]),
                      np.asarray(minv[:nlay]), float(tolabs), float(mid),
                      float(half))

    t0 = time.time()
    dev_out = step(jnp.asarray(slabs[0]), *consts)
    futures = []
    for k in range(n_blocks):
        nxt = step(jnp.asarray(slabs[k + 1]), *consts) \
            if k + 1 < n_blocks else None
        planes, deps, minv, nlay, tolabs, mid, half, triv = dev_out
        planes = np.asarray(planes)  # device->host transfer
        futures.append(pool.submit(host_side, k, planes, deps, minv, nlay,
                                   tolabs, mid, half, triv))
        dev_out = nxt
    for f in futures:
        f.result()
    enc_t = time.time() - t0
    nbytes_out = sum(len(r[0]) for r in results)
    # decode timing: host entropy decode + device accumulate+inverse
    from waverange_tpu.ops.quant import decode_step
    dstep = jax.jit(partial(decode_step, shape=slabs[0].shape, levels=4))
    n = slabs[0].size
    # warm-up
    r0 = results[0]
    nlay0 = len(r0[1])
    _ = jax.block_until_ready(dstep(
        jnp.zeros((nlay0, n), jnp.uint8), jnp.zeros(nlay0), jnp.zeros(nlay0)))
    t0 = time.time()
    errs = []
    for k, (payload, lens, deps, minv, tolabs, mid, half) in \
            enumerate(results):
        planes = wn.decode_planes_batch(payload, lens, n)
        rec = dstep(jnp.asarray(planes), jnp.asarray(deps),
                    jnp.asarray(minv))
        rec = np.asarray(rec)
        errs.append(float(np.abs(rec - slabs[k]).max()))
    dec_t = time.time() - t0
    return dict(encode_s=enc_t, decode_s=dec_t, nbytes_in=fld.nbytes,
                nbytes_out=nbytes_out, err=max(errs), nlay=None)


def bench_reference(fld, tol, workdir):
    """Time the locally built reference wrenc on the same data."""
    oracle = REPO / "build" / "oracle" / "wrenc"
    if not oracle.exists():
        try:
            subprocess.run([str(REPO / "tools/oracle/build_oracle.sh")],
                           check=True, capture_output=True)
        except Exception as e:
            log(f"  reference build failed: {e}")
            return None
    n = fld.shape[0]
    workdir.mkdir(parents=True, exist_ok=True)
    raw = workdir / "bench_in.bin"
    if not raw.exists() or raw.stat().st_size != fld.nbytes:
        fld.tofile(raw)
    args = [str(oracle), str(raw), str(workdir / "bench.wrb"),
            str(workdir / "bench.wrh"), "2", "0", "1", "2", str(n), str(n),
            str(n), repr(tol)]
    t0 = time.time()
    r = subprocess.run(args, cwd=workdir, capture_output=True)
    dt = time.time() - t0
    if r.returncode != 0:
        log(f"  reference wrenc failed rc={r.returncode}")
        return None
    out_size = (workdir / "bench.wrb").stat().st_size
    return dict(encode_s=dt, nbytes_in=fld.nbytes, nbytes_out=out_size)


def main():
    n = int(os.environ.get("WR_BENCH_N", "512"))
    tol = float(os.environ.get("WR_BENCH_TOL", "1e-16"))
    pairs = int(os.environ.get("WR_BENCH_PAIRS", "3"))
    fld = make_field(n)
    gib = fld.nbytes / 1e9

    # Interleaved native/reference pairs: this VM has multi-second
    # CPU-steal bursts, so alternating the two measurements and taking
    # each side's best keeps the comparison fair.
    skip_ref = os.environ.get("WR_BENCH_SKIP_REF") == "1"
    rn = None
    ref = None
    for k in range(pairs):
        log(f"pair {k+1}/{pairs}: native...")
        r = bench_native(fld, tol, reps=1)
        if rn is None:
            rn = r
        else:
            rn["encode_s"] = min(rn["encode_s"], r["encode_s"])
            rn["decode_s"] = min(rn["decode_s"], r["decode_s"])
        log(f"  encode {r['encode_s']:.2f}s decode {r['decode_s']:.2f}s")
        if not skip_ref:
            log(f"pair {k+1}/{pairs}: reference wrenc...")
            rr = bench_reference(fld, tol, REPO / "build" / "bench")
            if rr and (ref is None or rr["encode_s"] < ref["encode_s"]):
                ref = rr
            if rr:
                log(f"  encode {rr['encode_s']:.2f}s")
    log(f"native best: encode {rn['encode_s']:.2f}s "
        f"({gib/rn['encode_s']:.3f} GB/s), decode {rn['decode_s']:.2f}s, "
        f"ratio {rn['nbytes_out']/rn['nbytes_in']:.3f}, err {rn['err']:.2e}")
    # turbo (format v2, opt-in) pipeline: same layers, rANS entropy stage
    if os.environ.get("WR_BENCH_SKIP_TURBO") != "1":
        log("turbo (rans) pipeline...")
        rturbo = bench_native(fld, tol, reps=2, coder=1)
        log(f"turbo best: encode {rturbo['encode_s']:.2f}s "
            f"({gib/rturbo['encode_s']:.3f} GB/s), decode "
            f"{rturbo['decode_s']:.2f}s ({gib/rturbo['decode_s']:.3f} GB/s),"
            f" ratio {rturbo['nbytes_out']/rturbo['nbytes_in']:.3f}, "
            f"err {rturbo['err']:.2e}")
    if ref:
        log(f"reference best: encode {ref['encode_s']:.2f}s "
            f"({gib/ref['encode_s']:.3f} GB/s), ratio "
            f"{ref['nbytes_out']/ref['nbytes_in']:.3f}")

    # tpu hybrid path LAST: its warm-up thread cannot be cancelled if the
    # watchdog fires, and must not contaminate the host measurements.
    rt = None
    if os.environ.get("WR_BENCH_SKIP_TPU") != "1":
        try:
            import jax
            jax.config.update("jax_enable_x64", True)
            cache = str(REPO / "build" / "jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            log(f"tpu-hybrid pipeline on {jax.devices()[0].device_kind}...")
            rt = bench_tpu_hybrid(fld, tol)
            log(f"  encode {rt['encode_s']:.2f}s "
                f"({gib/rt['encode_s']:.3f} GB/s), decode "
                f"{rt['decode_s']:.2f}s, ratio "
                f"{rt['nbytes_out']/rt['nbytes_in']:.3f}, "
                f"err {rt['err']:.2e}")
        except Exception as e:
            log(f"  tpu-hybrid failed: {type(e).__name__}: {e}")

    best = min((r for r in (rn, rt) if r), key=lambda r: r["encode_s"])
    value = gib / best["encode_s"]
    vs = (ref["encode_s"] / best["encode_s"]) if ref else None
    print(json.dumps({
        "metric": f"encode GB/s, {n}^3 f64 @tol {tol:g} (1 chip + host)",
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
