"""Persistent TPU experiment runner (dev tool).

The axon tunnel pays a multi-minute one-time setup on the first
device->host transfer of a process, which makes one-shot experiment
scripts unusably slow.  This runner warms the tunnel once, then polls
``build/exp/queue`` for ``*.py`` job files, execs each in-process, and
writes stdout/stderr + status to ``build/exp/done/<name>.out``.

Usage:  python tools/exp_runner.py   (leave running in background)
Submit: write a python file into build/exp/queue/ ; read the .out file.
Jobs run with globals: jax, jnp, np, time, REPO (and anything they import).
"""
import io
import os
import sys
import time
import traceback

sys.setrecursionlimit(1_000_000)
from contextlib import redirect_stdout, redirect_stderr
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / "build" / "jax_cache"))
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_enable_x64", True)

QUEUE = REPO / "build" / "exp" / "queue"
DONE = REPO / "build" / "exp" / "done"
QUEUE.mkdir(parents=True, exist_ok=True)
DONE.mkdir(parents=True, exist_ok=True)


def warm():
    print("warming tunnel (first download can take ~10 min)...", flush=True)
    t0 = time.time()
    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    np.asarray(jax.jit(lambda a: a + jnp.uint32(1))(x))
    print(f"tunnel warm in {time.time()-t0:.1f}s on "
          f"{jax.devices()[0].device_kind}", flush=True)
    (DONE / "_warm").write_text("ok\n")


def run_job(path: Path):
    name = path.stem
    out = io.StringIO()
    status = "ok"
    t0 = time.time()
    code = ""
    try:
        code = path.read_text()
        g = dict(jax=jax, jnp=jnp, np=np, time=time, REPO=REPO,
                 __name__=f"job_{name}")
        with redirect_stdout(out), redirect_stderr(out):
            exec(compile(code, str(path), "exec"), g)
    except Exception:
        status = "error"
        out.write(traceback.format_exc())
    dt = time.time() - t0
    body = out.getvalue()
    (DONE / f"{name}.out").write_text(
        f"# status={status} wall={dt:.1f}s\n{body}")
    (DONE / f"{name}.py").write_text(code)   # keep the job source
    path.unlink()
    print(f"job {name}: {status} ({dt:.1f}s)", flush=True)


def main():
    warm()
    while True:
        jobs = sorted(QUEUE.glob("*.py"))
        for j in jobs:
            # skip files still being written (mtime < 0.3s ago)
            if time.time() - j.stat().st_mtime < 0.3:
                continue
            run_job(j)
        time.sleep(1.0)


if __name__ == "__main__":
    main()
