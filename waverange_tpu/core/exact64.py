"""Bit-exact f64 codec path on the accelerator (software IEEE arithmetic).

This is the answer to "TPUs have no f64": every per-element operation of
the codec — 3-D CDF 9/7 lifting, byte-layer quantization, residual
update, decode accumulate — runs as correctly-rounded binary64 built
from u32 integer ops (ops/softf64), which are exact on TPU. Per-layer
scalar parameters (deps, 1/deps, offsets, tolabs) are data-dependent
scalars; they are fetched to the host (two u32 pairs per layer) and
computed there in real IEEE doubles, exactly like the reference's host
code (wrappers.cpp:292-330). The result is bit-identical to the native
C++ pipeline / ISO-built reference on ANY backend; tests pin this on the
CPU backend (tests/test_softf64.py) and bench.py's WR_BENCH_VERIFY mode
asserts the stream equality on the real chip (the "exact64 on-chip"
verify line in the bench tail).

Throughput is ~100 integer ops per f64 op — this is the correctness
path; the f32 Pallas kernels and the rANS entropy stage are the
throughput paths. Reference contract: encoding_wrap/decoding_wrap
(wrappers.cpp:228-527).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import softf64 as sf
from ..ops.wavelet_soft64 import cdf97_forward_s, cdf97_inverse_s

NLAYMAX = 8
WAV_LVL = 4
WAV_ACC_COEF = 1.75
DBL_MIN = 2.2250738585072014e-308


# NOT jitted at this level: the wavelet module jits each axis sweep
# separately (one monolithic graph takes XLA minutes to compile).
def _fwd(h, l, levels: int):
    return cdf97_forward_s((h, l), levels)


def _inv(h, l, levels: int):
    return cdf97_inverse_s((h, l), levels)


@jax.jit
def _minmax(h, l):
    """Layer bounds as ONE stacked (4,) u32 array: a single device->host
    transfer per layer instead of four (each fetch pays the full tunnel/
    PCIe round-trip latency — 4 x ~25 ms per layer added up to ~0.6 s of
    the 256^3 encode)."""
    mnh, mnl = sf.reduce_min(h.ravel(), l.ravel())
    mxh, mxl = sf.reduce_max(h.ravel(), l.ravel())
    return jnp.stack([mnh, mnl, mxh, mxl])


@jax.jit
def _quant_layer(h, l, ah, al, bh, bl, dh, dl, mnh, mnl):
    """fq = a*x + b (truncated to u8); resid = x - (q*deps + mn).

    Also returns the residual's min/max as one stacked (4,) u32 array —
    the next layer's model bounds for free (the native pipeline's fused-
    quantizer structure, wr_native.cc quantize_residual_fused), saving a
    separate reduction dispatch + device round trip per layer."""
    fqh, fql = sf.add(*sf.mul(jnp.broadcast_to(ah, h.shape),
                              jnp.broadcast_to(al, h.shape), h, l),
                      jnp.broadcast_to(bh, h.shape),
                      jnp.broadcast_to(bl, h.shape))
    q = sf.to_u8_trunc(fqh, fql)
    qh, ql = sf.from_u8(q)
    th, tl = sf.add(*sf.mul(qh, ql, jnp.broadcast_to(dh, h.shape),
                            jnp.broadcast_to(dl, h.shape)),
                    jnp.broadcast_to(mnh, h.shape),
                    jnp.broadcast_to(mnl, h.shape))
    rh, rl = sf.sub(h, l, th, tl)
    return q, rh, rl, _minmax(rh, rl)


@jax.jit
def _acc_all(planes, scal8):
    """All-layer accumulate in ONE dispatch: unlike the encode loop,
    decode's per-layer scalars are known upfront (meta deps/minval
    vecs), so there is no host round trip to pipeline around. scal8:
    (nlay, 4) u32 rows [dh dl mnh mnl]; layer order preserved via scan
    (sequential adds — the reference accumulate order,
    wrappers.cpp:512-514)."""
    n = planes.shape[1]
    acc = (jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32))

    def body(acc, xs):
        q, s = xs
        return _acc_pair(acc, q, s), None

    def _acc_pair(acc, q, s):
        qh, ql = sf.from_u8(q)
        th, tl = sf.add(*sf.mul(qh, ql,
                                jnp.broadcast_to(s[0], q.shape),
                                jnp.broadcast_to(s[1], q.shape)),
                        jnp.broadcast_to(s[2], q.shape),
                        jnp.broadcast_to(s[3], q.shape))
        return sf.add(acc[0], acc[1], th, tl)

    acc, _ = jax.lax.scan(body, acc, (planes, scal8))
    return acc


def _scal(x: float):
    h, l = sf.from_scalar(float(x))
    return h, l


def encode_field_exact64(fld: np.ndarray, tolrel: float, wtflag: int = 1,
                         levels: int = WAV_LVL, coder: int = 1,
                         entropy: str = "device") -> dict:
    """Encode one (nz, ny, nx) f64 field; bit-identical metadata, planes
    and (given the same coder) streams as native.encode_field."""
    from .. import native as wn

    a = np.ascontiguousarray(fld, np.float64)
    n = a.size
    mn = float(np.min(a))  # min/max are exact in any reduction order
    mx = float(np.max(a))
    halfspan = (mx - mn) / 2
    mid = mn + halfspan
    meta = dict(midval=mid, halfspanval=halfspan,
                wlev=levels if wtflag else 0, deps_vec=np.zeros(NLAYMAX),
                minval_vec=np.zeros(NLAYMAX),
                len_enc_vec=np.zeros(NLAYMAX, np.uint64))
    if halfspan <= 2 * DBL_MIN:  # trivial exit (wrappers.cpp:257-266)
        meta.update(tolabs=0.0, wlev=0, nlay=0, ntot_enc=0, data=b"")
        return meta
    from ..utils import timed
    with timed("exact64.pack_upload"):
        h, l = sf.pack(a)
        jax.block_until_ready((h, l))
    if wtflag:
        with timed("exact64.wavelet"):
            h, l = _fwd(h, l, levels)
            jax.block_until_ready((h, l))
    h, l = h.ravel(), l.ravel()
    tolabs = tolrel * max(abs(mn), abs(mx))
    tolabs = tolabs / WAV_ACC_COEF
    meta["tolabs"] = tolabs

    planes = []
    with timed("exact64.layers"):
        mm_dev = _minmax(h, l)
        for ilay in range(NLAYMAX):
            mm = np.asarray(mm_dev)  # one transfer: [mnh mnl mxh mxl]
            mnw = float(sf.unpack(mm[0], mm[1]))
            mxw = float(sf.unpack(mm[2], mm[3]))
            deps = (mxw - mnw) / 255.0
            brk = deps < tolabs
            if brk:
                deps = tolabs
            aopt = 1.0 / deps
            bopt = -mnw * aopt + 0.5
            q, h, l, mm_dev = _quant_layer(h, l, *_scal(aopt),
                                           *_scal(bopt), *_scal(deps),
                                           *_scal(mnw))
            planes.append(q)
            meta["deps_vec"][ilay] = deps
            meta["minval_vec"][ilay] = mnw
            if brk or ilay == NLAYMAX - 1:
                break
    nlay = len(planes)
    meta["nlay"] = nlay
    with timed("exact64.entropy"):
        if entropy == "device":
            from ..ops import rans
            streams = rans.encode_planes_device(jnp.stack(planes), n)
            payload = b"".join(streams)
            lens = [len(s) for s in streams]
        else:
            pl = np.stack([np.asarray(p) for p in planes])
            payload, lens = wn.encode_planes_batch(pl, coder=coder)
    meta["len_enc_vec"][:nlay] = lens
    meta.update(ntot_enc=len(payload), data=payload)
    return meta


def decode_field_exact64(meta: dict, shape, coder: int = 1,
                         entropy: str = "device") -> np.ndarray:
    from .. import native as wn

    nz, ny, nx = shape
    n = nz * ny * nx
    if meta["ntot_enc"] == 0:
        return np.full(shape, meta["midval"])
    nlay = int(meta["nlay"])
    offs = np.concatenate(
        [[0], np.cumsum(meta["len_enc_vec"][:nlay])]).astype(int)
    if entropy == "device":
        from ..ops import rans
        layers = [bytes(meta["data"][offs[i]:offs[i + 1]])
                  for i in range(nlay)]
        planes = rans.decode_planes_device(layers, n)
    else:
        planes = jnp.asarray(wn.decode_planes_batch(
            meta["data"], meta["len_enc_vec"][:nlay], n, coder=coder))
    scal8 = np.zeros((nlay, 4), np.uint32)
    for i in range(nlay):
        d = np.float64(meta["deps_vec"][i]).view(np.uint64)
        m = np.float64(meta["minval_vec"][i]).view(np.uint64)
        scal8[i] = (d >> 32, d & 0xFFFFFFFF, m >> 32, m & 0xFFFFFFFF)
    acch, accl = _acc_all(jnp.asarray(planes), jnp.asarray(scal8))
    acch = acch.reshape(shape)
    accl = accl.reshape(shape)
    wlev = int(meta["wlev"])
    if wlev:
        acch, accl = _inv(acch, accl, wlev)
    return sf.unpack(np.asarray(acch), np.asarray(accl)).reshape(shape)
