"""Profile the dchain decode stages on real hardware (round-5 perf).

Splits ``decode_compute_seconds``'s device-resident region into its
three components — model/payload layout glue (`_dchain_prep`), the
Pallas decode kernel (`dchain`), and slot composition
(`_compose_planes`) — for a bench-shaped workload, so the next lever
(ROADMAP item 3: payload-layout transpose vs compose-scatter fusion)
is picked from a measurement rather than a guess.

Usage: python tools/profile_dchain.py [nplanes] [n]
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
from waverange_tpu.ops import rans_kernels as rk  # noqa: E402


def t(fn, *a, reps=3, **k):
    jax.block_until_ready(fn(*a, **k))  # warm/compile
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
    gb = L * n / 1e9
    print(f"planes: {L} x {n} symbols ({gb*1e3:.1f} MB)", flush=True)
    rng = np.random.default_rng(0)
    base = rng.normal(128, 20, size=(L, n)).clip(0, 255).astype(np.uint8)
    planes = jnp.asarray(base)
    jax.block_until_ready(planes)
    streams = rans.encode_planes_device(planes, n)
    print(f"encoded: {sum(len(s) for s in streams)/1e6:.1f} MB",
          flush=True)

    t0 = time.time()
    dev, Bp, PC, Ls, nb = rans._dchain_host_prep(streams, n)
    for v in dev.values():
        jax.block_until_ready(v)
    print(f"host prep+upload:{(time.time()-t0)*1e3:9.1f} ms "
          f"(Bp {Bp}, PC {PC})", flush=True)

    c0, bc, pcc = dev["chunks"][0]
    dt, (cum_t, scum, pay) = t(
        lambda: rans._dchain_prep(dev["freqs"], dev["pay2d"],
                                  c0, bc, pcc))
    print(f"dchain_prep:     {dt*1e3:9.1f} ms", flush=True)

    dt, syms = t(lambda: rk.dchain(cum_t, scum, dev["states"],
                                   dev["wlen"], dev["bs"], pay))
    print(f"dchain kernel:   {dt*1e3:9.1f} ms ({gb/dt:.3f} GB/s)",
          flush=True)

    dt, out = t(lambda: rans._compose_planes(
        syms.T, dev["slots_b"], dev["rawbuf"], dev["slots_r"],
        Ls, nb, n))
    print(f"compose:         {dt*1e3:9.1f} ms", flush=True)

    dt, _ = t(lambda: rans._dchain_device(dev, Bp, PC, Ls, nb, n))
    print(f"TOTAL device:    {dt*1e3:9.1f} ms ({gb/dt:.3f} GB/s)",
          flush=True)
    ok = bool(jnp.all(out == planes))
    print("round trip OK" if ok else "ROUND TRIP MISMATCH", flush=True)


if __name__ == "__main__":
    main()
