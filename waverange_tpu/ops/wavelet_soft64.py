"""CDF 9/7 lifting wavelet in software-IEEE-f64 (ops/softf64) arithmetic.

Purpose: BIT-EXACT f64 transform on TPU hardware. XLA's x64 emulation on
TPU is an f32-pair scheme (~2^-43 floor, measured in bench verify mode);
this module instead computes every lifting add/mul as correctly rounded
binary64 on u32 pairs, so device output matches the ISO-built reference
(`waveletcdf97_3d.c`) bit for bit — the same property the native C++
path has on the host.

Compile-time design (the round-2 verdict's complaint was minutes-long
jits): every axis sweep is canonicalized to ONE 2-D layout — (lines, n)
with the lifted axis last — so a cube field shares a single compiled
graph across its three axis sweeps per level, and the four lifting
stages run as a 2-iteration `lax.scan` over (predict, update)
coefficient pairs so each soft-float op appears once in the traced
graph instead of four times. Together: a 4-level cube round trip
compiles ~8 small graphs (seconds each) instead of ~24 large ones.

Operation ORDER is identical to the reference lifting
(waveletcdf97_3d.c:82-142 per axis; scan constants only change which
coefficient multiplies, never the sequence of rounded operations), so
results stay bit-exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import softf64 as sf
from .wavelet import (EXT0, EXT1, EXT2, L0, L1, L2, L3, SCALE, SCALE_INV,
                      _halve)


def _slice(p, start, stop, stride=1):
    """Column slice of a (lines, n) soft pair."""
    return tuple(jax.lax.slice_in_dim(w, start, stop, stride=stride,
                                      axis=1) for w in p)


def _concat(ps):
    return tuple(jnp.concatenate([p[k] for p in ps], axis=1)
                 for k in range(2))


def _shift_down(p):
    """v[i] <- v[i+1], clamped at the end (symmetric boundary)."""
    n = p[0].shape[1]
    return _concat([_slice(p, 1, n), _slice(p, n - 1, n)])


def _shift_up(p):
    """v[i] <- v[i-1], clamped at the start."""
    n = p[0].shape[1]
    return _concat([_slice(p, 0, 1), _slice(p, 0, n - 1)])


def _add(a, b):
    return sf.add(a[0], a[1], b[0], b[1])


def _sub(a, b):
    return sf.sub(a[0], a[1], b[0], b[1])


def _mulc(a, c):
    return sf.mul_const(a[0], a[1], c)


def _mulv(a, ch, cl):
    """a * c where c is a traced scalar (hi, lo) pair (scan constant)."""
    return sf.mul(a[0], a[1], jnp.broadcast_to(ch, a[0].shape),
                  jnp.broadcast_to(cl, a[0].shape))


def _pairs(c0, c1, c2, c3):
    """Stack lifting coefficients into scan xs: (2, 4) u32 of
    (c_hi, c_lo) x (predict, update) per iteration."""
    import numpy as np
    vals = []
    for a, b in ((c0, c1), (c2, c3)):
        ah, al = np.float64(a).view(np.uint64) >> 32, \
            np.float64(a).view(np.uint64) & 0xFFFFFFFF
        bh, bl = np.float64(b).view(np.uint64) >> 32, \
            np.float64(b).view(np.uint64) & 0xFFFFFFFF
        vals.append([ah, al, bh, bl])
    return jnp.asarray(vals, jnp.uint32)


_FWD_PAIRS = _pairs(L0, L1, L2, L3)
_INV_PAIRS = _pairs(L3, L2, L1, L0)


def _lift_fwd_lines(v):
    """Forward lifting along the last axis of a (lines, n) pair, n >= 2.
    Mirrors waveletcdf97_3d.c:82-142: deinterleave, odd-extension, four
    lifting stages, scale, pack [lo | hi]."""
    n = v[0].shape[1]
    m = _halve(n)
    lo = _slice(v, 0, n, stride=2)
    odd = _slice(v, 1, n, stride=2)
    if n % 2:
        lo_m2 = _slice(lo, m - 2, m - 1)
        lo_m1 = _slice(lo, m - 1, m)
        hi_m2 = _slice(odd, m - 2, m - 1)
        tail = _add(_add(_mulc(lo_m2, EXT0), _mulc(hi_m2, EXT1)),
                    _mulc(lo_m1, EXT2))
        hi = _concat([odd, tail])
    else:
        hi = odd

    def stage(carry, cs):
        lo, hi = carry
        hi = _add(hi, _mulv(_add(_shift_down(lo), lo), cs[0], cs[1]))
        lo = _add(lo, _mulv(_add(hi, _shift_up(hi)), cs[2], cs[3]))
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(stage, (lo, hi), _FWD_PAIRS)

    lo = _mulc(lo, SCALE)
    hi = _mulc(hi, SCALE_INV)
    if n % 2:
        hi = _slice(hi, 0, n - m)
    return _concat([lo, hi])


def _lift_inv_lines(v):
    """Inverse lifting along the last axis of a (lines, n) pair."""
    n = v[0].shape[1]
    q = _halve(n)
    lo = _mulc(_slice(v, 0, q), SCALE_INV)
    hi = _mulc(_slice(v, q, n), SCALE)
    if n % 2:
        z = (jnp.zeros((v[0].shape[0], 1), jnp.uint32),
             jnp.zeros((v[0].shape[0], 1), jnp.uint32))
        hi = _concat([hi, z])

    def stage(carry, cs):
        lo, hi = carry
        lo = _sub(lo, _mulv(_add(hi, _shift_up(hi)), cs[0], cs[1]))
        hi = _sub(hi, _mulv(_add(_shift_down(lo), lo), cs[2], cs[3]))
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(stage, (lo, hi), _INV_PAIRS)

    out = []
    for k in range(2):
        st = jnp.stack([lo[k], hi[k]], axis=2)
        out.append(st.reshape(lo[k].shape[0], 2 * q))
    out = tuple(out)
    if n % 2:
        out = _slice(out, 0, n)
    return out


# One compiled graph per (lines, n, direction): a cube field reuses it
# across all three axis sweeps of a level.
@partial(jax.jit, static_argnums=(2,))
def _lift_jit(h, l, fwd: bool):
    f = _lift_fwd_lines if fwd else _lift_inv_lines
    return f((h, l))


def _sweep(x, axis: int, fwd: bool):
    """Lift one axis of a 3-D (h, l) pair via the canonical 2-D layout."""
    shape = x[0].shape
    n = shape[axis]
    perm = tuple(a for a in range(3) if a != axis) + (axis,)
    inv_perm = tuple(perm.index(a) for a in range(3))
    h = x[0].transpose(perm).reshape(-1, n)
    l = x[1].transpose(perm).reshape(-1, n)
    h, l = _lift_jit(h, l, fwd)
    pshape = tuple(shape[a] for a in perm)
    return (h.reshape(pshape).transpose(inv_perm),
            l.reshape(pshape).transpose(inv_perm))


def _set_subbox(x, sub):
    if sub[0].shape == x[0].shape:
        return sub
    return tuple(jax.lax.dynamic_update_slice(x[k], sub[k], (0, 0, 0))
                 for k in range(2))


def cdf97_forward_s(x, levels: int):
    """x: (hi, lo) u32 pair of shape (nz, ny, nx)."""
    nz, ny, nx = x[0].shape
    az, ay, ax_ = nz, ny, nx
    for _ in range(levels):
        sub = tuple(w[:az, :ay, :ax_] for w in x)
        if ax_ > 1:
            sub = _sweep(sub, 2, True)
        if ay > 1:
            sub = _sweep(sub, 1, True)
        if az > 1:
            sub = _sweep(sub, 0, True)
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
            sub = _sweep(sub, 0, False)
        if ay > 1:
            sub = _sweep(sub, 1, False)
        if ax_ > 1:
            sub = _sweep(sub, 2, False)
        x = _set_subbox(x, sub)
    return x
