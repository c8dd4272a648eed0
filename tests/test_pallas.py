"""Pallas lifting kernels: interpret-mode equivalence with the XLA path.

Tolerances are a few f32 ulp: the kernels run under jit where XLA may
contract multiply-adds into FMAs, while the reference ops here run
eagerly — the same documented rounding envelope as the jax f32 device
path (bit-exactness is the f64 native/XLA path's contract, not f32's).
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
    np.testing.assert_allclose(rp, rx, rtol=1e-5, atol=1e-5)


def test_pallas_fallback_odd(monkeypatch):
    # odd active extents (x=65 at level 2) fall back to XLA per level
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(WP.pl, "pallas_call", interp)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 4, 130)), jnp.float32)
    r = np.asarray(WP.cdf97_forward_pallas(x, 2))
    rx = np.asarray(cdf97_forward(x, 2))
    np.testing.assert_allclose(r, rx, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 16, 256), (16, 32, 128), (4, 8, 128)])
def test_fused_xy_and_xyz_match_xla(shape, monkeypatch):
    # The fused z-slab (x+y) and whole-box (x+y+z) kernels must agree
    # with the XLA forward transform (same elementwise expressions).
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(WP.pl, "pallas_call", interp)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    rx = np.asarray(cdf97_forward(x, 2))
    rp = np.asarray(WP.cdf97_forward_pallas(x, 2))
    np.testing.assert_allclose(rp, rx, rtol=1e-5, atol=1e-5)


def test_fused_xy_kernel_directly(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(WP.pl, "pallas_call", interp)
    from waverange_tpu.ops.wavelet import _lift_fwd_axis
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 16, 128)), jnp.float32)
    want = _lift_fwd_axis(_lift_fwd_axis(x, 2), 1)
    got = WP.lift_xy_pallas(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_inverse_fused_roundtrip(monkeypatch):
    # forward (XLA) then fused-pallas inverse must reconstruct
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(WP.pl, "pallas_call", interp)
    from waverange_tpu.ops.wavelet import cdf97_inverse
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 16, 256)), jnp.float32)
    w = cdf97_forward(x, 2)
    ri = np.asarray(cdf97_inverse(w, 2))
    rp = np.asarray(WP.cdf97_inverse_pallas(w, 2))
    np.testing.assert_allclose(rp, ri, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rp, np.asarray(x), rtol=1e-4, atol=1e-4)


def test_fused_quantizer_matches_scan(monkeypatch):
    # fused pallas quantizer must reproduce the scan quantizer exactly
    # (bounds are exact in any reduction order; same quantize exprs)
    import jax.experimental.pallas as pl
    from waverange_tpu.ops import quant_pallas as QP
    from waverange_tpu.ops.quant import quantize_layers
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(QP.pl, "pallas_call", interp)
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal(4096 * 8) * 5, jnp.float32)
    tol = jnp.asarray(2e-4, jnp.float32)
    qa = jnp.asarray(255.0, jnp.float32)
    ps, ds, ms_, nls = quantize_layers(w, tol, qa)
    pp, dp, mp, nlp = QP.quantize_layers_pallas(w, tol, qa)
    assert int(nls) == int(nlp)
    nl = int(nls)
    assert np.array_equal(np.asarray(ds), np.asarray(dp))
    assert np.array_equal(np.asarray(ms_), np.asarray(mp))
    assert np.array_equal(np.asarray(ps[:nl]), np.asarray(pp[:nl]))


def test_fused_accumulate_matches_xla(monkeypatch):
    import jax.experimental.pallas as pl
    from waverange_tpu.ops import quant_pallas as QP
    from waverange_tpu.ops.quant import accumulate_layers
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(QP.pl, "pallas_call", interp)
    rng = np.random.default_rng(7)
    nlay, n = 5, 4096 * 4
    planes = jnp.asarray(rng.integers(0, 256, (nlay, n)), jnp.uint8)
    deps = jnp.asarray(rng.random(nlay), jnp.float32)
    minv = jnp.asarray(rng.standard_normal(nlay), jnp.float32)
    want = accumulate_layers(planes, deps, minv, dtype=jnp.float32)
    got = QP.accumulate_layers_pallas(planes, deps, minv)
    # few-ulp FMA envelope (interpret mode jits the kernel, the
    # reference ops run eagerly); on hardware both jit identically and
    # were measured exactly equal
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
