"""Pallas TPU kernels for the format-v2 interleaved-rANS entropy stage.

Byte-format oracle: ``turbo::encode_plane_t`` / ``decode_plane_t`` in
``native/src/wr_native.cc`` — streams produced here are byte-identical,
pinned three ways: the XLA scan path A/B (tests/test_rans_device.py),
the ACTUAL kernels through the Pallas interpreter in the default CPU
suite (tests/test_rans_kernels_interpret.py, WR_PALLAS_INTERPRET=1),
and on real hardware (WR_TPU=1 tests + every bench verify run).

Why kernels (round-3 perf work): the XLA implementation in ops/rans.py
is correct everywhere but loses ~100x to hardware limits on real chips —
XLA gathers (2.3 s to pre-gather one slab's models), scatter-adds
(0.9 s histograms), scatter-compaction (1.1 s) and per-scan-step
overhead dominate. Mosaic on this stack supports only (8, W)-shaped
``dynamic_gather`` and no cumsum/scatter in kernels, so every stage is
restructured around full-width vector ops:

  1. ``hist_blocks`` — per-block 256-bin histogram by compare-sweep.
  2. normalize       — XLA (ops/rans._normalize_freqs, while_loop).
  3. ``pregather``   — e[i] = freq|cum<<16 per symbol, via 32 8-entry
                       subtable gathers + select (the only legal
                       dynamic_gather shape is one (8, W) tile).
  4. ``chain``       — the 8-lane rANS recurrences for all blocks at
                       once: grid (tiles, chunks), lane states in
                       persistent scratch; dense words + emit flags.
  5. ``compact``     — per-block stream compaction: Hillis-Steele
                       prefix + 17-stage monotone log-shift routing
                       over a (512, 128) flattened-position tile, a
                       16-slot right-roll to make room for the lane
                       state words, then masked DMAs into ONE aligned
                       u16 buffer at scalar-prefetched block offsets.

The host slices per-block payloads from that single download and frames
tags/models with numpy — no per-symbol host work anywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 14
PROB_SCALE = 1 << PROB_BITS
TBLOCK = 1 << 16
RANS_L = 1 << 16
LANES = 8
G = TBLOCK // LANES          # 8192 groups per block

_U32 = jnp.uint32
_I32 = jnp.int32

ALIGN_WORDS = 2048           # payload alignment: 16 rows x 128 u16
MAX_PIECES = 16              # cap: 32768 words >= the raw-escape bound
                             # (raw iff 2*wlen + 516 >= bs, wr_native.cc)


def _u32(x):
    return jnp.asarray(x, _U32)


def _env_interpret() -> bool:
    """WR_PALLAS_INTERPRET=1 runs every kernel in interpreter mode —
    the CPU-suite hook for A/B-testing the kernel pipeline against the
    C++ coder without a real chip (tests/test_rans_kernels_interpret)."""
    import os
    return os.environ.get("WR_PALLAS_INTERPRET") == "1"


# Every pallas_call below is invoked under jax.enable_x64(False): the
# enclosing process runs jax_enable_x64 (the codec's host arithmetic is
# f64), under which fori_loop counters, index-map results and weak ints
# trace as i64 — and Mosaic either rejects 64-bit types or (for some
# convert pairs) recurses without terminating during lowering. All
# kernel arithmetic is explicitly 32-bit, so x32 tracing is
# value-identical.


# ---------------------------------------------------------------------------
# 1. Histogram kernel: counts (B, 256) from blocks_t (TBLOCK, B) u8.
# ---------------------------------------------------------------------------
_HIST_TB = 128
_HIST_RC = 8192   # symbol rows per grid step (1 MB u8 block)
_HIST_CH = 2048   # rows per inner sweep chunk


def _hist_kernel(nc: int, s_ref, o_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        o_ref[:] = jnp.zeros((256, _HIST_TB), _I32)

    rows = jax.lax.broadcasted_iota(_I32, (256, _HIST_TB), 0)

    def outer(v, acc):
        def inner(i, cnt):
            s = s_ref[pl.ds(i * _HIST_CH, _HIST_CH), :].astype(_I32)
            return cnt + jnp.sum((s == v).astype(_I32), axis=0,
                                 dtype=_I32)
        cnt = jax.lax.fori_loop(0, _HIST_RC // _HIST_CH, inner,
                                jnp.zeros((_HIST_TB,), _I32))
        return acc + jnp.where(rows == v, cnt[None, :], 0)

    o_ref[:] = jax.lax.fori_loop(0, 256, outer, o_ref[:])


@partial(jax.jit, static_argnums=(1,))
def hist_blocks(blocks_t: jax.Array, interpret: bool = False) -> jax.Array:
    """blocks_t (TBLOCK, B) u8 position-major -> counts (B, 256) i32.

    Grid (tiles, row-chunks): the output tile is revisited across the
    sequential row-chunk dimension and accumulates in VMEM (the whole
    65536-row column set would need 8 MB x 2 pipeline buffers).
    Pad symbols land in bin 0 of their block; the caller subtracts the
    pad count from bin 0 (cheaper than masking in-kernel)."""
    interpret = interpret or _env_interpret()
    B = blocks_t.shape[1]
    assert B % _HIST_TB == 0, B
    nc = TBLOCK // _HIST_RC
    with jax.enable_x64(False):
        counts = pl.pallas_call(
            partial(_hist_kernel, nc),
            grid=(B // _HIST_TB, nc),
            out_shape=jax.ShapeDtypeStruct((256, B), _I32),
            in_specs=[pl.BlockSpec((_HIST_RC, _HIST_TB),
                                   lambda t, c: (c, t),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, _HIST_TB), lambda t, c: (0, t),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(blocks_t)
    return counts.T


# ---------------------------------------------------------------------------
# 3. Pre-gather kernel: e (TBLOCK, B) u32 = etab_t[sym, block].
# ---------------------------------------------------------------------------
_PG_TB = 128
_PG_CH = 512


def _pregather_kernel(s_ref, tab_ref, o_ref):
    def rowgroup(rg, _):
        s8 = s_ref[pl.ds(rg * 8, 8), :].astype(_I32)   # (8, TB)
        lo = s8 & 7
        hi = s8 >> 3
        acc = jnp.zeros((8, _PG_TB), _U32)
        for t in range(32):
            sub = tab_ref[t * 8:t * 8 + 8, :]          # (8, TB) u32
            cand = jnp.take_along_axis(sub, lo, axis=0)
            acc = jnp.where(hi == t, cand, acc)
        o_ref[pl.ds(rg * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, _PG_CH // 8, rowgroup, 0)


@partial(jax.jit, static_argnums=(2,))
def pregather(blocks_t: jax.Array, etab_t: jax.Array,
              interpret: bool = False) -> jax.Array:
    """blocks_t (TBLOCK, B) u8, etab_t (256, B) u32 -> e (TBLOCK, B) u32.

    Legal-gather workaround: Mosaic's dynamic_gather only accepts one
    (8, W) index tile, so the 256-entry per-block table is processed as
    32 subtables of 8 rows — one gather per subtable, kept where the
    symbol's high 5 bits match the subtable id (32 gathered candidates
    + selects per 8-row group of symbol positions).
    """
    interpret = interpret or _env_interpret()
    B = blocks_t.shape[1]
    assert B % _PG_TB == 0
    with jax.enable_x64(False):
        return pl.pallas_call(
            _pregather_kernel,
            grid=(TBLOCK // _PG_CH, B // _PG_TB),
            out_shape=jax.ShapeDtypeStruct((TBLOCK, B), _U32),
            in_specs=[
                pl.BlockSpec((_PG_CH, _PG_TB), lambda c, t: (c, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, _PG_TB), lambda c, t: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_PG_CH, _PG_TB), lambda c, t: (c, t),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(blocks_t, etab_t)


# ---------------------------------------------------------------------------
# 4. Chain kernel.
# ---------------------------------------------------------------------------
_CH_TB = 128
_CH_GC = 512


def _u32_to_f32(x):
    lo = (x & _u32(0x7FFFFFFF)).astype(_I32).astype(jnp.float32)
    hi = (x >> _u32(31)).astype(_I32).astype(jnp.float32)
    return lo + hi * jnp.float32(2147483648.0)


def _f32_to_u32_small(f):
    return f.astype(_I32).astype(_U32)


def _exact_divmod_k(x, d, split: int):
    """floor(x/d), x%d for u32 vectors; d << split <= 2^23.

    Two rounds of long division with f32 quotient estimates; integer
    fix-ups absorb estimate error (within +-2), so hardware f32 divide
    accuracy never leaks into the result (mirrors ops/rans._exact_divmod
    but avoids u32<->f32 casts, which Mosaic can't lower)."""
    d1 = d << _u32(split)
    q1 = _f32_to_u32_small(_u32_to_f32(x) / _u32_to_f32(d1))
    r1 = x - q1 * d1
    half = _u32(0x80000000)
    for _ in range(2):
        over = r1 >= half
        q1 = jnp.where(over, q1 - _u32(1), q1)
        r1 = jnp.where(over, r1 + d1, r1)
        under = jnp.logical_and(r1 < half, r1 >= d1)
        q1 = jnp.where(under, q1 + _u32(1), q1)
        r1 = jnp.where(under, r1 - d1, r1)
    q0 = _f32_to_u32_small(_u32_to_f32(r1) / _u32_to_f32(d))
    r0 = r1 - q0 * d
    for _ in range(2):
        over = r0 >= half
        q0 = jnp.where(over, q0 - _u32(1), q0)
        r0 = jnp.where(over, r0 + d, r0)
        under = jnp.logical_and(r0 < half, r0 >= d)
        q0 = jnp.where(under, q0 + _u32(1), q0)
        r0 = jnp.where(under, r0 - d, r0)
    return (q1 << _u32(split)) + q0, r0


def _chain_kernel(nc: int, e_ref, bs_ref, words_ref, emits_ref,
                  xout_ref, x_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x_ref[:] = jnp.full((8, _CH_TB), RANS_L, _U32)

    base_g = (nc - 1 - c) * _CH_GC
    bs = bs_ref[:]
    lane = jax.lax.broadcasted_iota(_I32, (8, _CH_TB), 0)

    def body(i, x):
        gl = _CH_GC - 1 - i
        e = e_ref[gl]
        g = base_g + gl
        f = e & _u32(0xFFFF)
        cum = e >> _u32(16)
        active = (g * 8 + lane) < bs
        fs = jnp.where(f == _u32(0), _u32(1), f)
        xmax = fs << _u32(18)
        emit = jnp.logical_and(active, x >= xmax)
        words_ref[gl] = (x & _u32(0xFFFF)).astype(jnp.uint16)
        emits_ref[gl] = emit.astype(jnp.uint8)
        x1 = jnp.where(emit, x >> _u32(16), x)
        q, r = _exact_divmod_k(x1, fs, 9)
        xn = (q << _u32(PROB_BITS)) + r + cum
        return jnp.where(active, xn, x)

    x_ref[:] = jax.lax.fori_loop(0, _CH_GC, body, x_ref[:])

    @pl.when(c == nc - 1)
    def _():
        xout_ref[:] = x_ref[:]


@partial(jax.jit, static_argnums=(2,))
def chain(e: jax.Array, bs_row: jax.Array, interpret: bool = False):
    """e (G, 8, B) u32 pre-gathered models (reverse-order consumption is
    internal); bs_row (1, B) i32. Returns (words (G,8,B) u16,
    emits (G,8,B) u8, x_fin (8, B) u32)."""
    interpret = interpret or _env_interpret()
    B = e.shape[2]
    assert B % _CH_TB == 0
    nc = G // _CH_GC
    with jax.enable_x64(False):
        return _chain_call(e, bs_row, nc, interpret)


def _chain_call(e, bs_row, nc, interpret):
    B = e.shape[2]
    return pl.pallas_call(
        partial(_chain_kernel, nc),
        grid=(B // _CH_TB, nc),
        out_shape=(jax.ShapeDtypeStruct((G, 8, B), jnp.uint16),
                   jax.ShapeDtypeStruct((G, 8, B), jnp.uint8),
                   jax.ShapeDtypeStruct((8, B), _U32)),
        in_specs=[
            pl.BlockSpec((_CH_GC, 8, _CH_TB),
                         lambda t, c: (nc - 1 - c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CH_TB), lambda t, c: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_CH_GC, 8, _CH_TB),
                         lambda t, c: (nc - 1 - c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_GC, 8, _CH_TB),
                         lambda t, c: (nc - 1 - c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _CH_TB), lambda t, c: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((8, _CH_TB), _U32)],
        interpret=interpret,
    )(e, bs_row)


# ---------------------------------------------------------------------------
# 5. Compaction kernel (one block per grid step).
# ---------------------------------------------------------------------------
_CP_R = TBLOCK // 128        # 512 rows x 128 positions


def _shift_lower(x, sh: int):
    """out[p] = x[p + sh] over the flattened (R, 128) layout."""
    hi, lo = sh // 128, sh % 128
    y = x
    if hi >= x.shape[0]:
        return jnp.zeros_like(x)
    if hi:
        y = jnp.concatenate([y[hi:], jnp.zeros((hi, 128), y.dtype)],
                            axis=0)
    if lo:
        ynext = jnp.concatenate([y[1:], jnp.zeros((1, 128), y.dtype)],
                                axis=0)
        y = jnp.concatenate([y[:, lo:], ynext[:, :lo]], axis=1)
    return y


def _shift_higher(x, sh: int):
    """out[p] = x[p - sh] (zeros in front)."""
    hi, lo = sh // 128, sh % 128
    y = x
    if hi >= x.shape[0]:
        return jnp.zeros_like(x)
    if lo:
        yprev = jnp.concatenate([jnp.zeros((1, 128), y.dtype), y[:-1]],
                                axis=0)
        y = jnp.concatenate([yprev[:, 128 - lo:], y[:, :128 - lo]],
                            axis=1)
    if hi:
        y = jnp.concatenate([jnp.zeros((hi, 128), y.dtype), y[:-hi]],
                            axis=0)
    return y


def _compact_kernel(off_ref, np_ref, words_ref, emits_ref, states_ref,
                    out_ref, sem):
    b = pl.program_id(0)
    w = words_ref[0].astype(_I32)            # (R, 128)
    em = emits_ref[0].astype(_I32)

    # inclusive prefix sum of em over flattened positions
    pre = em
    for k in range(16):
        pre = pre + _shift_higher(pre, 1 << k)

    rows = jax.lax.broadcasted_iota(_I32, (_CP_R, 128), 0)
    cols = jax.lax.broadcasted_iota(_I32, (_CP_R, 128), 1)
    pos = rows * 128 + cols
    tgt = pre - 1                            # stream slot of kept words
    s = pos - tgt                            # left shift; >= 0, monotone
    v = jnp.where(em != 0, w, 0)

    # Monotone log-shift routing with OR-combine: kept elements never
    # collide (strictly increasing targets); dropped/emptied slots carry
    # v = 0 so stray arrivals are harmless. Kept shifts are <= 65535
    # (tgt >= 0), so 16 stages route everything that matters.
    for k in range(16):
        sh = 1 << k
        cand_v = _shift_lower(v, sh)
        cand_s = _shift_lower(s, sh)
        take = (cand_s & sh) != 0
        stay = (s & sh) == 0
        v = jnp.where(take, cand_v, 0) | jnp.where(stay, v, 0)
        s = jnp.where(take, cand_s, jnp.where(stay, s, 0))

    # make room for the 16 lane-state words, then splice them in
    v = _shift_higher(v, 16)
    strow = states_ref[0][0:1, :].astype(_I32)      # (1, 128), cols 0-15
    v = jnp.where(jnp.logical_and(rows == 0, cols < 16),
                  jnp.broadcast_to(strow, (_CP_R, 128)), v)

    def scope(vm, dsem):
        vm[:] = v.astype(jnp.uint16)
        base = off_ref[b]          # in ALIGN_WORDS units
        npieces = np_ref[b]

        def piece(i, _):
            @pl.when(i < npieces)
            def _():
                cp = pltpu.make_async_copy(
                    vm.at[pl.ds(i * 16, 16), :],
                    out_ref.at[pl.ds((base + i) * 16, 16), :],
                    dsem)
                cp.start()
                cp.wait()
            return 0
        jax.lax.fori_loop(0, MAX_PIECES, piece, 0)

    pl.run_scoped(scope, pltpu.VMEM((_CP_R, 128), jnp.uint16),
                  pltpu.SemaphoreType.DMA)


@partial(jax.jit, static_argnums=(5, 6))
def compact(offsets: jax.Array, npieces: jax.Array, words_b: jax.Array,
            emits_b: jax.Array, states16: jax.Array, total_rows: int,
            interpret: bool = False) -> jax.Array:
    """Assemble per-block payloads into ONE aligned (total_rows, 128)
    u16 buffer.

    offsets/npieces: (B,) i32 per-block destination (ALIGN_WORDS units)
    and piece count (<= MAX_PIECES; blocks past the raw-escape bound are
    truncated — their payload is never read).
    words_b/emits_b: (B, 512, 128) position-major per block.
    states16: (B, 8, 128) i32, the 16 LE u16 halves of the final lane
    states in [:, 0, :16] (padded to a legal Mosaic block shape).
    Rows not covered by any block's pieces are uninitialized.
    """
    interpret = interpret or _env_interpret()
    B = words_b.shape[0]
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, _CP_R, 128),
                             lambda b, off, np_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _CP_R, 128),
                             lambda b, off, np_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda b, off, np_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(
            _compact_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((total_rows, 128), jnp.uint16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(offsets, npieces, words_b, emits_b, states16)


# ---------------------------------------------------------------------------
# 6. Decode kernel.
#
# Per tile of TB blocks the 8 lane states advance through G groups.
# slot -> (symbol, freq, cumExcl) is resolved by a 256-iteration sweep
# over the per-block cumulative table (Mosaic has no usable gather for
# 16K-entry slot tables), and renorm words are consumed through a
# deterministic-cadence window hierarchy whose rebuilds use only static
# middle-dim slices + K-way selects, plus one legal (8, TB) row-gather
# per window column on refill:
#
#   refill <- W1 (16 cols = 128 words/block, rebuilt every 4 steps,
#                 7-way select from L2 at 64-word granules)
#          <- L2 (96 cols = 768 words, rebuilt every 16 steps,
#                 8-way select from L3 at 256-word granules)
#          <- L3 (384 cols = 3072 words, rebuilt every 128 steps by an
#                 up-to-30-way select from the tile's payload, which one
#                 legal whole-tile DMA parks in VMEM at chunk 0; the
#                 payload column capacity PC is a per-call static sized
#                 to the actual max word count, so short streams don't
#                 pay the full 32768-word DMA)
#
# Coverage proof sketch (consumption <= 8 words/block/step, lookahead
# <= 8): at each L3 refill cur_rel3 in [0,1024), growth 128*8 = 1024,
# L2 granule clamp g2 <= 9 gives reach <= 9*256+768 = 3072 <= 3072; at
# each L2 rebuild W1 granule clamp c1 <= 10 gives reach <= 10*64+128
# = 768 <= 768; at each W1 rebuild cur_rel1 in [0,64), growth 4*8 =
# 32, lookahead 8 < 128. Payload HBM layout: (B, 8, 4096) u16, word w of block b at
# [b, w & 7, w >> 3]; slots past wlen are zero and never consumed
# (widx < wlen mirrors the C++ decoder's `w + 1 < wend` guard).
# ---------------------------------------------------------------------------
_DC_TB = 256     # blocks per tile: the per-step loop machinery is a
                 # fixed ~32 ms/slab floor at 128 (measured empty-body,
                 # round 4) — 256 halves the step count for the same
                 # total vector work (round-5: 146 -> ~1.9x less floor)
_DC_TB_WIDE = 512  # large-batch tile: quarters the step count again
                 # (bench slab kernel 95.9 -> 82.5 ms, byte-identical,
                 # round-5 hw A/B); only used when the batch is already
                 # >= 512 blocks so small fields don't pay 2x padding
_DC_TB_XWIDE = 1024  # slab-class tile when the payload capacity fits
                 # VMEM (82.5 -> 74.8 ms, byte-identical hw A/B); the
                 # (8, PC, TB) u16 payload scratch is the VMEM driver,
                 # so callers only pick this when PC <= _XWIDE_PC_MAX
_XWIDE_PC_MAX = 3328  # 8*3328*1024*2 = 55 MB payload scratch (proven
                 # compile); near-raw batches (PC up to 4096) would
                 # need 67 MB + windows and are left on the 512 tile
_DC_GC = 256
_DC_NC = G // _DC_GC
_W1C = 16
_L2C = 96
_L3C = 384
_PAYC = 4096     # max payload columns (8 words each; 32768-word cap)


def _row_prefix_incl(x):
    """Inclusive prefix sum along the 8-row (lane) axis of (8, TB)."""
    for sh in (1, 2, 4):
        x = x + jnp.concatenate(
            [jnp.zeros((sh, x.shape[1]), x.dtype), x[:-sh]], axis=0)
    return x


def _dc_kernel(cum_ref, scum_ref, x0_ref, wlen_ref, bs_ref, pay_ref,
               syms_ref, x_ref, cur_ref, payv_ref, l3_ref, l3b_ref,
               l2_ref, l2b_ref, w1_ref, w1b_ref, sem):
    t = pl.program_id(0)
    c = pl.program_id(1)
    TB = wlen_ref.shape[1]                   # tile width (static)
    PC = payv_ref.shape[1]                   # payload cols (static)
    n_g3 = (PC - _L3C) // 128 + 1            # L3 granule candidates
    lane = jax.lax.broadcasted_iota(_I32, (8, TB), 0)
    wlen = wlen_ref[:]                       # (1, TB)
    bs = bs_ref[:]

    @pl.when(c == 0)
    def _():
        x_ref[:] = x0_ref[:]
        cur_ref[:] = jnp.zeros((1, TB), _I32)
        cp = pltpu.make_async_copy(
            pay_ref.at[:, :, pl.ds(t * TB, TB)], payv_ref, sem)
        cp.start()
        cp.wait()

    # Window rebuilds iterate only the OCCUPIED granule range
    # [min(g), max(g)+1) instead of every candidate (round-5 profile:
    # the all-candidate rebuilds were 84% of the step — 555 of 660 ms
    # per slab; a 128-block tile usually holds one layer whose chains
    # advance nearly in step, so the occupied range is ~1-2 granules.
    # Value-identical by construction: iterations outside the range
    # never matched the == mask). 655 -> 188 ms/slab measured.

    def l3_refill():
        g3 = jnp.minimum(cur_ref[:] >> 10, n_g3 - 1)    # (1, TB)

        # fori + dynamic middle-dim slice keeps the traced IR small
        # (the 30-way unrolled select stalled the Mosaic compiler)
        def pick(p, out):
            cand = payv_ref[:, pl.ds(p * 128, _L3C), :]
            return jnp.where(
                jnp.broadcast_to((g3[0] == p)[None, None, :],
                                 (8, _L3C, TB)), cand, out)
        l3_ref[:] = jax.lax.fori_loop(
            jnp.min(g3), jnp.max(g3) + 1, pick,
            jnp.zeros((8, _L3C, TB), jnp.uint16))
        l3b_ref[:] = g3 * 1024

    def l2_rebuild():
        rel = cur_ref[:] - l3b_ref[:]                     # (1, TB)
        # clamp g2 <= 9 for near-raw-length modeled blocks; p=9 slices
        # [288:384] which stays in _L3C
        g2 = jnp.minimum(rel >> 8, (_L3C * 8 - _L2C * 8) // 256)
        def pick(p, out):
            cand = l3_ref[:, pl.ds(p * 32, _L2C), :]
            return jnp.where(
                jnp.broadcast_to((g2[0] == p)[None, None, :],
                                 (8, _L2C, TB)), cand, out)
        l2_ref[:] = jax.lax.fori_loop(
            jnp.min(g2), jnp.max(g2) + 1, pick,
            jnp.zeros((8, _L2C, TB), jnp.uint16))
        l2b_ref[:] = l3b_ref[:] + g2 * 256

    def w1_rebuild():
        rel = cur_ref[:] - l2b_ref[:]
        # clamp c1 <= 10; p=10 slices [80:96] which stays in _L2C
        c1 = jnp.minimum(rel >> 6, (_L2C * 8 - _W1C * 8) // 64)
        def pick(p, out):
            cand = l2_ref[:, pl.ds(p * 8, _W1C), :]
            return jnp.where(jnp.broadcast_to(
                (c1[0] == p)[None, None, :], (8, _W1C, TB)), cand, out)
        w1_ref[:] = jax.lax.fori_loop(
            jnp.min(c1), jnp.max(c1) + 1, pick,
            jnp.zeros((8, _W1C, TB), jnp.uint16))
        w1b_ref[:] = l2b_ref[:] + c1 * 64

    def step(i, _):
        # Cadences 128/32/8 (was 128/16/4): reach analysis with the
        # worst-case 8-words/step advance — w1 at 8: widx-w1b <= 63 +
        # 8*7 + 7 = 126 < 128; l2 at 32: cur-l2b <= 255 + 8*31 = 503 ->
        # c1 <= 7 (clamp 10). Each cadence divides the next level's
        # (8 | 32 | 128) so bases never go stale across a refill.
        @pl.when(i % 128 == 0)
        def _():
            l3_refill()

        @pl.when(i % 32 == 0)
        def _():
            l2_rebuild()

        @pl.when(i % 8 == 0)
        def _():
            w1_rebuild()

        x = x_ref[:]
        cur = cur_ref[:]
        slot = (x & _u32(PROB_SCALE - 1)).astype(_I32)     # (8, TB)

        # Two-level sweep: the 32-row-subsampled table (scum) locates
        # the symbol's 32-row chunk in 8 compares; only the OCCUPIED
        # chunk range is swept (quantized layers concentrate mass in a
        # few chunks — range is ~1-2 for real data), with cum_e/cum_i
        # extracted in-chunk (4 aligned 8-row gathers each) instead of
        # a separate 32-iteration lookup. Value-identical to the full
        # 256-row count: rows below the chunk all satisfy cum <= slot
        # (cum[32*csel] = scum[csel] <= slot), rows above none
        # (cum[32*(csel+1)] = scum[csel+1] > slot); equal-cum runs land
        # on the run's last index either way, so cum_i > cum_e always.
        scnt = jnp.zeros((8, TB), _I32)
        for p8 in range(8):
            scnt = scnt + (scum_ref[p8:p8 + 1, :] <= slot).astype(_I32)
        csel = scnt - 1                  # chunk of the symbol (>= 0)

        def chunk_fn(p, carry):
            sym_c, ce_c, ci_c = carry
            cs32 = cum_ref[pl.ds(p * 32, 32), :]           # (32, TB)
            cnt = jnp.zeros((8, TB), _I32)
            for j in range(32):
                cnt = cnt + (cs32[j:j + 1, :] <= slot).astype(_I32)
            loc = cnt - 1                # in-chunk row, in [0, 32)
            lo = loc & 7
            hiq = loc >> 3
            lop = cnt & 7
            hip = cnt >> 3               # in [0, 4]; 4 = next chunk
            ge = jnp.zeros((8, TB), _I32)
            gi = jnp.zeros((8, TB), _I32)
            for q in range(4):
                sub = cs32[q * 8:(q + 1) * 8, :]
                ge = jnp.where(hiq == q,
                               jnp.take_along_axis(sub, lo, axis=0), ge)
                gi = jnp.where(hip == q,
                               jnp.take_along_axis(sub, lop, axis=0), gi)
            # cnt == 32: cum_i is the next chunk's first row — read from
            # scum (rows 8..15 are PROB_SCALE padding, so p = 7 is safe)
            nxt = scum_ref[pl.ds(p + 1, 1), :]
            gi = jnp.where(hip == 4, jnp.broadcast_to(nxt, (8, TB)), gi)
            hit = csel == p
            sym_c = jnp.where(hit, p * 32 + loc, sym_c)
            ce_c = jnp.where(hit, ge, ce_c)
            ci_c = jnp.where(hit, gi, ci_c)
            return sym_c, ce_c, ci_c

        sym, cum_e, cum_i = jax.lax.fori_loop(
            jnp.min(csel), jnp.max(csel) + 1, chunk_fn,
            (jnp.zeros((8, TB), _I32), jnp.zeros((8, TB), _I32),
             jnp.full((8, TB), PROB_SCALE, _I32)))
        f = (cum_i - cum_e).astype(_U32)
        offv = (slot - cum_e).astype(_U32)

        g = c * _DC_GC + i
        active = (g * 8 + lane) < bs
        xn = f * (x >> _u32(PROB_BITS)) + offv
        need = jnp.logical_and(active, xn < _u32(RANS_L))
        ni = need.astype(_I32)
        incl = _row_prefix_incl(ni)
        r = incl - ni
        widx = cur + r                                     # (8, TB)
        can = jnp.logical_and(need, widx < wlen)

        wrel = widx - w1b_ref[:]
        wrow = wrel & 7
        wcol = wrel >> 3                                   # in [0, 16)
        # (A per-column occupied-range fori was tried here round-5 and
        # does not lower: Mosaic requires dynamic dim-1 slice starts to
        # be provably 8-aligned, which single-column starts are not —
        # the 16-column static select IS the alignment-legal form.)
        word = jnp.zeros((8, TB), _I32)
        for cc in range(_W1C):
            col = w1_ref[:, cc, :].astype(_I32)            # (8, TB)
            gcc = jnp.take_along_axis(col, wrow, axis=0)
            word = jnp.where(wcol == cc, gcc, word)

        xr = jnp.where(can, (xn << _u32(16)) | word.astype(_U32), xn)
        x_ref[:] = jnp.where(active, xr, x)
        cur_ref[:] = cur + jnp.sum(can.astype(_I32), axis=0,
                                   dtype=_I32)[None, :]
        syms_ref[pl.ds(i * 8, 8), :] = sym.astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, _DC_GC, step, 0)


@partial(jax.jit, static_argnums=(6, 7))
def dchain(cum_t, scum, x0, wlen_row, bs_row, pay,
           interpret: bool = False, tb: int = 0):
    """Decode the lane chains for B blocks.

    cum_t (256, B) i32 exclusive cumulative tables; scum (16, B) i32
    32-row-subsampled tables (rows p < 8 = cum[32p], rows >= 8 =
    PROB_SCALE padding — the two-level sweep's chunk locator); x0
    (8, B) u32 lane states; wlen_row/bs_row (1, B) i32; pay (8, PC, B)
    u16 payload words (word w of block b at [w & 7, w >> 3, b]) where
    PC is a multiple of 128 with _L3C+128 <= PC <= _PAYC and every
    block's wlen <= PC*8 — callers size PC to the batch's max word
    count so short streams don't DMA the full 32768-word capacity.
    tb: blocks per tile (0 = _DC_TB); callers with >= _DC_TB_WIDE
    blocks pass the wide tile (quarter the per-step loop overhead).
    Returns syms (TBLOCK, B) u8 (position-major).
    """
    interpret = interpret or _env_interpret()
    B = cum_t.shape[1]
    PC = pay.shape[1]
    _TB = tb or _DC_TB
    assert B % _TB == 0
    assert PC % 128 == 0 and _L3C + 128 <= PC <= _PAYC, PC
    with jax.enable_x64(False):
        return pl.pallas_call(
            _dc_kernel,
            grid=(B // _TB, _DC_NC),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((TBLOCK, B), jnp.uint8),
            in_specs=[
                pl.BlockSpec((256, _TB), lambda t, c: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, _TB), lambda t, c: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _TB), lambda t, c: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TB), lambda t, c: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TB), lambda t, c: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # full payload
            ],
            out_specs=pl.BlockSpec((_DC_GC * 8, _TB),
                                   lambda t, c: (c, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, _TB), _U32),       # x
                pltpu.VMEM((1, _TB), _I32),       # cur
                pltpu.VMEM((8, PC, _TB), jnp.uint16),  # payload
                pltpu.VMEM((8, _L3C, _TB), jnp.uint16),
                pltpu.VMEM((1, _TB), _I32),       # l3 base
                pltpu.VMEM((8, _L2C, _TB), jnp.uint16),
                pltpu.VMEM((1, _TB), _I32),       # l2 base
                pltpu.VMEM((8, _W1C, _TB), jnp.uint16),
                pltpu.VMEM((1, _TB), _I32),       # w1 base
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(cum_t, scum, x0, wlen_row, bs_row, pay)
