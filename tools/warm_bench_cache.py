"""Pre-compile the bench's device programs into the persistent cache.

Run after any kernel/device-path change: the driver's bench run pays
fresh Mosaic/XLA compiles otherwise (a single unlucky batch shape has
cost ~13 min through the remote compile helper), and its tpu-section
budget assumes warm caches. `make_field` is seeded, so this compiles
the EXACT shapes the driver's run will request.

Usage: python tools/warm_bench_cache.py [n]
"""
import os
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tol2 = float(os.environ.get("WR_BENCH_TOL_TPU", "1e-10"))
    tol3 = float(os.environ.get("WR_BENCH_TOL_FAST", "1e-5"))
    fld = bench.make_field(n)
    t0 = time.time()
    r2 = bench.bench_tpu_full(fld, tol2)
    bench.log(f"tol {tol2:g}: encode {r2['encode_s']:.2f}s decode "
              f"{r2['decode_s']:.2f}s err {r2['err']:.2e} "
              f"({time.time()-t0:.0f}s incl compiles)")
    if r2.get("onchip"):
        c = r2["onchip"]
        sg = c.get("slab_gb", 0.134)
        for k in ("step_s", "rans_enc_compute_s", "rans_dec_compute_s",
                  "rans_enc_s", "rans_dec_s", "dstep_s"):
            if k in c:
                bench.log(f"  onchip {k}: {c[k]:.3f}s "
                          f"({sg/c[k]:.2f} GB/s)")
    t0 = time.time()
    r3 = bench.bench_tpu_full(fld, tol3, onchip=False)
    bench.log(f"tol {tol3:g}: encode {r3['encode_s']:.2f}s decode "
              f"{r3['decode_s']:.2f}s err {r3['err']:.2e} "
              f"({time.time()-t0:.0f}s)")
    if os.environ.get("WR_WARM_MARGIN", "1") != "0":
        # margin + verify sections touch dchain batch shapes nothing
        # else uses (full-field 512^3 decode: Bp up to 16384)
        t0 = time.time()
        bench.margin_envelope(fld, [128])
        if n >= 512:
            bench.margin_envelope(fld, [512], tols=(1e-7,))
        bench.log(f"margin shapes warmed ({time.time()-t0:.0f}s)")
        t0 = time.time()
        bench.verify_on_chip(fld, float(os.environ.get(
            "WR_BENCH_TOL", "1e-16")))
        bench.log(f"verify shapes warmed ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
