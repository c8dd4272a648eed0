"""Interpret-mode A/B of the Pallas kernel pipeline on the CPU backend.

The encode kernels are ON by default on accelerators but the default
CPU suite only exercises the XLA scan path; this runs the actual kernel
pipeline (hist/pregather/chain/compact) through the Pallas interpreter
and asserts byte-identity with the C++ turbo coder — the same assertion
the WR_TPU hardware tests make on a real chip (ADVICE r3).

Runs in a subprocess because WR_PALLAS_INTERPRET is read at trace time
(in-process it would poison the jit cache for other tests), and because
the axon sitecustomize must be overridden after the jax import.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
from waverange_tpu import native as wn
from waverange_tpu.ops import rans

rng = np.random.default_rng(3)
cases = {
    "normal": rng.normal(128, 20, 65536 + 4321).clip(0, 255)
        .astype(np.uint8),
    "sparse": (rng.random(65536) < 0.02).astype(np.uint8),
}
assert rans._use_kernels(), "WR_RANS_KERNELS=1 must force the kernels"
for name, data in cases.items():
    import jax.numpy as jnp
    got = rans._encode_planes_kernels(jnp.asarray(data[None, :]),
                                      data.size)[0]
    want = wn.encode_plane(data, coder=1)
    assert got == want, (name, len(got), len(want))
    print(name, "ok", len(got))
print("ALL-OK")
"""


def test_kernel_pipeline_interpret_byte_identity():
    env = dict(os.environ, WR_RANS_KERNELS="1", WR_PALLAS_INTERPRET="1",
               JAX_COMPILATION_CACHE_DIR="",
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    r = subprocess.run([sys.executable, "-c", _SCRIPT % {"repo": REPO}],
                       capture_output=True, text=True, timeout=3000,
                       env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ALL-OK" in r.stdout
