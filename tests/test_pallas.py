"""Pallas x-sweep kernel: interpret-mode equivalence with the XLA path.

On real TPUs the kernel was verified bit-equal to the XLA forward
transform (f32); here the interpreter validates the same on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waverange_tpu.ops.wavelet import cdf97_forward
from waverange_tpu.ops import wavelet_pallas as WP


@pytest.mark.parametrize("shape", [(8, 8, 256), (4, 16, 512)])
def test_pallas_matches_xla_interpret(shape, monkeypatch):
    # route pallas_call through the interpreter on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(WP.pl, "pallas_call", interp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    rx = np.asarray(cdf97_forward(x, 2))
    rp = np.asarray(WP.cdf97_forward_pallas(x, 2))
    np.testing.assert_allclose(rp, rx, rtol=2e-6, atol=2e-6)


def test_pallas_fallback_odd():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 4, 130)), jnp.float32)
    # odd active extent at level 2 -> falls back to XLA (no error)
    r = WP.cdf97_forward_pallas(x, 2)
    assert r.shape == x.shape
