"""Pallas TPU kernel for the x-axis (lane-dimension) lifting sweep.

The y/z sweeps vectorize trivially in XLA (elementwise over the
contiguous x lanes), but the x sweep needs an even/odd deinterleave along
the 128-lane dimension — a relayout XLA handles with strided slices.
This kernel keeps the whole line in VMEM, does the deinterleave and the
four lifting stages in-register per (rows × n) tile, and writes the
packed [lo*s | hi/s] result — one HBM read + one write per element.

Used for the f32 throughput path (`cdf97_forward_pallas`). The f64
conformance path stays on XLA/native (Mosaic has no f64 emulation).
Only even line lengths are supported (odd falls back to the XLA op).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavelet import (L0, L1, L2, L3, SCALE, SCALE_INV, _halve,
                      cdf97_forward as _xla_forward)


def _lift_x_kernel(x_ref, o_ref):
    """One (R, n) tile: forward-lift every row along the last axis."""
    v = x_ref[:]                      # (R, n)
    R, n = v.shape
    m = n // 2
    lo = v[:, 0::2]                   # (R, m)
    hi = v[:, 1::2]
    # stage 1: hi += L0*(lo_next + lo), edge-replicated
    lo_next = jnp.concatenate([lo[:, 1:], lo[:, m - 1:]], axis=1)
    hi = hi + L0 * (lo_next + lo)
    # stage 2: lo += L1*(hi + hi_prev)
    hi_prev = jnp.concatenate([hi[:, :1], hi[:, :m - 1]], axis=1)
    lo = lo + L1 * (hi + hi_prev)
    # stage 3
    lo_next = jnp.concatenate([lo[:, 1:], lo[:, m - 1:]], axis=1)
    hi = hi + L2 * (lo_next + lo)
    # stage 4
    hi_prev = jnp.concatenate([hi[:, :1], hi[:, :m - 1]], axis=1)
    lo = lo + L3 * (hi + hi_prev)
    o_ref[:] = jnp.concatenate([lo * SCALE, hi * SCALE_INV], axis=1)


def lift_x_pallas(x: jax.Array, rows_per_tile: int = 256) -> jax.Array:
    """Forward-lift along the last axis of a 2-D (rows, n) array."""
    rows, n = x.shape
    assert n % 2 == 0, "pallas x-sweep requires even line length"
    rt = min(rows_per_tile, rows)
    while rows % rt:
        rt //= 2
    grid = (rows // rt,)
    return pl.pallas_call(
        _lift_x_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((rt, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rt, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def _pallas_applicable(nx: int, levels: int) -> bool:
    ax_ = nx
    for _ in range(levels):
        if ax_ % 2 or ax_ < 128:
            return False
        ax_ //= 2
    return True


def cdf97_forward_pallas(x: jax.Array, levels: int) -> jax.Array:
    """Forward transform with the Pallas x-sweep (f32 throughput path).

    Falls back to the XLA implementation when any level's active x extent
    is odd or below the kernel's minimum tile width.
    """
    from .wavelet import _lift_fwd_axis, _set_subbox

    nz, ny, nx = x.shape
    if not _pallas_applicable(nx, levels):
        return _xla_forward(x, levels)
    az, ay, ax_ = nz, ny, nx
    for _ in range(levels):
        sub = x[:az, :ay, :ax_]
        flat = sub.reshape(az * ay, ax_)
        flat = lift_x_pallas(flat)
        sub = flat.reshape(az, ay, ax_)
        if ay > 1:
            sub = _lift_fwd_axis(sub, 1)
        if az > 1:
            sub = _lift_fwd_axis(sub, 0)
        x = _set_subbox(x, sub, (az, ay, ax_))
        az, ay, ax_ = _halve(az), _halve(ay), _halve(ax_)
    return x
