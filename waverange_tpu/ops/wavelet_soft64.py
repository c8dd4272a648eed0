"""CDF 9/7 lifting wavelet in software-IEEE-f64 (ops/softf64) arithmetic.

Purpose: BIT-EXACT f64 transform on TPU hardware. XLA's x64 emulation on
TPU is an f32-pair scheme (~2^-43 floor, measured in bench verify mode);
this module instead computes every lifting add/mul as correctly rounded
binary64 on u32 pairs, so device output matches the ISO-built reference
(`waveletcdf97_3d.c`) bit for bit — the same property the native C++
path has on the host.

Structure mirrors ops/wavelet.py exactly (same op order per element);
arrays are (hi, lo) u32 bit-pattern pairs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import softf64 as sf
from .wavelet import (EXT0, EXT1, EXT2, L0, L1, L2, L3, SCALE, SCALE_INV,
                      _halve)


def _slice(p, start, stop, axis, stride=1):
    return tuple(jax.lax.slice_in_dim(w, start, stop, stride=stride,
                                      axis=axis) for w in p)


def _concat(ps, axis):
    return tuple(jnp.concatenate([p[k] for p in ps], axis=axis)
                 for k in range(2))


def _shift_down(p, axis):
    n = p[0].shape[axis]
    return _concat([_slice(p, 1, n, axis), _slice(p, n - 1, n, axis)], axis)


def _shift_up(p, axis):
    n = p[0].shape[axis]
    return _concat([_slice(p, 0, 1, axis), _slice(p, 0, n - 1, axis)], axis)


def _add(a, b):
    return sf.add(a[0], a[1], b[0], b[1])


def _sub(a, b):
    return sf.sub(a[0], a[1], b[0], b[1])


def _mulc(a, c):
    return sf.mul_const(a[0], a[1], c)


def _lift_fwd_axis(v, axis):
    n = v[0].shape[axis]
    m = _halve(n)
    lo = _slice(v, 0, n, axis, stride=2)
    odd = _slice(v, 1, n, axis, stride=2)
    if n % 2:
        lo_m2 = _slice(lo, m - 2, m - 1, axis)
        lo_m1 = _slice(lo, m - 1, m, axis)
        hi_m2 = _slice(odd, m - 2, m - 1, axis)
        tail = _add(_add(_mulc(lo_m2, EXT0), _mulc(hi_m2, EXT1)),
                    _mulc(lo_m1, EXT2))
        hi = _concat([odd, tail], axis)
    else:
        hi = odd

    hi = _add(hi, _mulc(_add(_shift_down(lo, axis), lo), L0))
    lo = _add(lo, _mulc(_add(hi, _shift_up(hi, axis)), L1))
    hi = _add(hi, _mulc(_add(_shift_down(lo, axis), lo), L2))
    lo = _add(lo, _mulc(_add(hi, _shift_up(hi, axis)), L3))

    lo = _mulc(lo, SCALE)
    hi = _mulc(hi, SCALE_INV)
    if n % 2:
        hi = _slice(hi, 0, n - m, axis)
    return _concat([lo, hi], axis)


def _lift_inv_axis(v, axis):
    n = v[0].shape[axis]
    q = _halve(n)
    lo = _mulc(_slice(v, 0, q, axis), SCALE_INV)
    hi = _mulc(_slice(v, q, n, axis), SCALE)
    if n % 2:
        zshape = list(v[0].shape)
        zshape[axis] = 1
        z = (jnp.zeros(zshape, jnp.uint32), jnp.zeros(zshape, jnp.uint32))
        hi = _concat([hi, z], axis)

    lo = _sub(lo, _mulc(_add(hi, _shift_up(hi, axis)), L3))
    hi = _sub(hi, _mulc(_add(_shift_down(lo, axis), lo), L2))
    lo = _sub(lo, _mulc(_add(hi, _shift_up(hi, axis)), L1))
    hi = _sub(hi, _mulc(_add(_shift_down(lo, axis), lo), L0))

    out = []
    for k in range(2):
        st = jnp.stack([lo[k], hi[k]], axis=axis + 1)
        shape = list(v[k].shape)
        shape[axis] = 2 * q
        out.append(st.reshape(shape))
    out = tuple(out)
    if n % 2:
        out = _slice(out, 0, n, axis)
    return out


def _set_subbox(x, sub):
    if sub[0].shape == x[0].shape:
        return sub
    return tuple(jax.lax.dynamic_update_slice(x[k], sub[k], (0, 0, 0))
                 for k in range(2))


# Each axis sweep is jitted separately (per shape/axis): the softf64 ops
# expand to ~10^2 primitives each, and one monolithic 4-level graph takes
# XLA minutes to compile on a small host — a dozen small graphs compile
# in seconds and the dispatch overhead is negligible next to the
# integer arithmetic.
@partial(jax.jit, static_argnums=(2, 3))
def _lift_jit(h, l, axis: int, fwd: bool):
    f = _lift_fwd_axis if fwd else _lift_inv_axis
    return f((h, l), axis)


def cdf97_forward_s(x, levels: int):
    """x: (hi, lo) u32 pair of shape (nz, ny, nx)."""
    nz, ny, nx = x[0].shape
    az, ay, ax_ = nz, ny, nx
    for _ in range(levels):
        sub = tuple(w[:az, :ay, :ax_] for w in x)
        if ax_ > 1:
            sub = _lift_jit(*sub, 2, True)
        if ay > 1:
            sub = _lift_jit(*sub, 1, True)
        if az > 1:
            sub = _lift_jit(*sub, 0, True)
        x = _set_subbox(x, sub)
        az, ay, ax_ = _halve(az), _halve(ay), _halve(ax_)
    return x


def cdf97_inverse_s(x, levels: int):
    nz, ny, nx = x[0].shape

    def cdiv_pow(n, k):
        p = 1 << k
        return n // p + (1 if n % p else 0)

    for k in range(levels, 0, -1):
        az, ay, ax_ = (cdiv_pow(nz, k - 1), cdiv_pow(ny, k - 1),
                       cdiv_pow(nx, k - 1))
        sub = tuple(w[:az, :ay, :ax_] for w in x)
        if az > 1:
            sub = _lift_jit(*sub, 0, False)
        if ay > 1:
            sub = _lift_jit(*sub, 1, False)
        if ax_ > 1:
            sub = _lift_jit(*sub, 2, False)
        x = _set_subbox(x, sub)
    return x
