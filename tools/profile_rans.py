"""Profile the device rANS stages on real hardware (round-3 perf work).

Times each stage of ops/rans.py separately for a bench-shaped workload
(8 layer planes x 16.7M symbols = one 64x512x512 f64 slab's quantized
output), so the 11.9s bench number can be attributed.

Usage: python tools/profile_rans.py [nplanes] [n]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   "build", "jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from waverange_tpu.ops import rans  # noqa: E402


def t(fn, *a, reps=2, **k):
    fn(*a, **k)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = fn(*a, **k)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best, r


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64 * 512 * 512
    print(f"planes: {L} x {n} symbols ({L*n/1e6:.1f} MB total)",
          flush=True)
    rng = np.random.default_rng(0)
    # realistic layer-plane statistics: peaked around a few values (layer
    # residuals concentrate) - use clipped gaussian byte values
    base = rng.normal(128, 20, size=(L, n)).clip(0, 255).astype(np.uint8)
    planes = jnp.asarray(base)
    jax.block_until_ready(planes)

    nb = -(-n // rans.TBLOCK)
    B = L * nb
    Bpad = rans._bucket(B)
    print(f"blocks: {B} (pad {Bpad}), groups G = {rans.TBLOCK//8}",
          flush=True)

    bs = rans._plane_bs(L, nb, n, Bpad)
    bs_d = jnp.asarray(bs, jnp.int32)

    dt, blocks = t(lambda: rans._blockify(planes, nb, Bpad, n))
    print(f"blockify:        {dt*1e3:9.1f} ms", flush=True)

    dt, counts = t(lambda: rans._histogram(blocks, bs_d))
    print(f"histogram:       {dt*1e3:9.1f} ms", flush=True)

    dt, freqs = t(lambda: rans._normalize_freqs(counts, bs_d))
    print(f"normalize:       {dt*1e3:9.1f} ms", flush=True)

    G = rans.TBLOCK // 8
    for unroll in (4, 16):
        dt, scan_out = t(lambda u=unroll: rans._encode_scan(
            blocks, bs_d, G, u))
        print(f"encode_scan u{unroll:<3d}{dt*1e3:9.1f} ms "
              f"({L*n/1e9/dt:.3f} GB/s)", flush=True)
    freqs, nsym, x_fin, words, emits, nwords = scan_out

    t0 = time.time()
    nsym_h = np.asarray(nsym)
    nwords_h = np.asarray(nwords)
    print(f"small downloads: {(time.time()-t0)*1e3:9.1f} ms", flush=True)
    wlens_h = np.where(nsym_h > 1, nwords_h + 16, 0)
    total = int(wlens_h.sum())
    Wcap = rans._bucket(max(total, 1))
    print(f"total words: {total} ({2*total/1e6:.1f} MB), Wcap {Wcap}",
          flush=True)
    wl_d = jnp.asarray(wlens_h, jnp.int32)
    dt, stream_d = t(lambda: rans._encode_compact(
        x_fin, words, emits, nsym, bs_d, wl_d, Wcap))
    print(f"encode_compact:  {dt*1e3:9.1f} ms", flush=True)

    t0 = time.time()
    stream = np.asarray(stream_d)
    print(f"stream download: {(time.time()-t0)*1e3:9.1f} ms "
          f"({2*Wcap/1e6:.1f} MB)", flush=True)
    t0 = time.time()
    freqs_h = np.asarray(freqs).astype("<u2")
    print(f"freqs download:  {(time.time()-t0)*1e3:9.1f} ms", flush=True)

    offs = np.concatenate([[0], np.cumsum(wlens_h)])
    bs_h = bs
    t0 = time.time()
    raw_ids = rans._raw_candidates(bs_h, nsym_h, wlens_h, B)
    out = []
    for ip in range(L):
        out.append(rans._assemble_blocks(
            range(ip * nb, (ip + 1) * nb), bs_h, nsym_h, wlens_h,
            freqs_h, stream, offs, {}))
    print(f"host assembly:   {(time.time()-t0)*1e3:9.1f} ms "
          f"({len(raw_ids)} raw blocks)", flush=True)

    # full path for comparison
    t0 = time.time()
    streams = rans.encode_planes_device(planes, n)
    print(f"FULL encode:     {(time.time()-t0)*1e3:9.1f} ms", flush=True)

    # ---- decode side ----
    t0 = time.time()
    batch, raws, freqs_a, states_a, words_a, wlen_a, bs_a = \
        rans._parse_to_batch(streams, [n] * L)
    print(f"dec parse:       {(time.time()-t0)*1e3:9.1f} ms "
          f"(Wcap {words_a.shape[1]})", flush=True)
    Gd = -(-int(bs_a.max()) // 8)
    fa, sa, wa, wla, ba = (jnp.asarray(freqs_a), jnp.asarray(states_a),
                           jnp.asarray(words_a), jnp.asarray(wlen_a),
                           jnp.asarray(bs_a))
    jax.block_until_ready((fa, sa, wa))
    for unroll in (4, 16):
        dt, syms = t(lambda u=unroll: rans._decode_scan(
            fa, sa, wa, wla, ba, Gd, u), reps=1)
        print(f"decode_scan u{unroll:<3d}{dt*1e3:9.1f} ms "
              f"({L*n/1e9/dt:.3f} GB/s)", flush=True)
    t0 = time.time()
    back = rans.decode_planes_device(streams, n)
    jax.block_until_ready(back)
    print(f"FULL decode:     {(time.time()-t0)*1e3:9.1f} ms", flush=True)
    ok = bool(jnp.all(back == planes))
    print("round trip OK" if ok else "ROUND TRIP MISMATCH", flush=True)


if __name__ == "__main__":
    main()
