"""Pallas TPU kernel: variable-width token bit-packing, one pass.

The encode pipeline's last stage turns (value, nbits<=32) token streams
into the reference's MSB-first u32 word arena (io/BitOStream.hpp:79-88
layout). In plain XLA every formulation hits a TPU wall: scatter-add runs
at ~0.09 GB/s, 256-entry-table gathers at ~0.04 GB/s, and the
associative-scan + searchsorted pack takes >30 min to compile
(etc/probe2.py, probe3.py). This kernel does the whole job in one pass:

  grid (B, T): block b, tile t of 1024 tokens shaped [8, 128]
  1. tile-local inclusive sum-scan of nbits (7 masked lane rolls + 3
     sublane rolls) + running bit-offset carry in SMEM -> per-token global
     exclusive bit offset
  2. per-token word contributions: hi -> word off>>5, lo -> next word
     (tokens straddle at most one boundary since nbits <= 32)
  3. per 128-token row: XOR-scan of hi contributions keyed by target word
     w0 (elements i and i-k combine iff w0 matches — w0 is non-decreasing,
     so equal w0 <=> same segment; keying avoids i1 flag vectors, which
     Mosaic cannot dynamic-rotate); segment-last lanes hold each word's
     combined contribution. Only the last token of a segment can straddle,
     so interior lo parts are zero.
  4. scatter within the tile via a one-hot byte-plane matmul
     onehot[8, WIN_T=1280, 128] @ planes[8, 128, 8] on the MXU (slot =
     word index relative to the tile's 128-aligned base; bit-disjoint
     contributions make sum == or, byte planes keep everything exact in
     bf16/f32). Contributions at or beyond n_words are masked to slot -1
     so an overflowing stream drops bits exactly like pack_tokens.
  5. one XOR read-modify-write of the WIN_T-word aligned window into the
     VMEM-resident output arena per tile; rows/tiles/blocks sharing a
     boundary word compose through the XOR

Bit-exact with ops/bitpack.pack_tokens; validated against it in
tests/test_bitpack_pallas.py (interpret mode) and on TPU by the encode
roundtrip tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # tokens per tile, shaped [8, 128]
UNROLL = 4  # byte tiles per grid step in the fused kernel
WIN_T = 1280  # aligned window per 1024-token tile (1024 words + 129 + align slack)
# scatter window cascade per 1024-token tile: 256 covers avg code length
# <= ~7 bits (typical text), 640 <= ~16 bits, 1280 = worst case (32-bit
# tokens). Each tile picks the smallest window its bit span fits.
WINDOWS = (256, 640, WIN_T)


def _roll_down(x, k, axis):
    """x shifted so element i reads element i-k (no wrap: masked later)."""
    return pltpu.roll(x, k, axis=axis)


def _tile_scan(nb):
    """Step 1 (carry-independent): inclusive sum-scan of nb in flat
    (row-major) token order. Returns (incl [8,128], rsum [8,128]); the
    tile's total bits are rsum[7, *]. Kept separate from the offset-
    dependent steps so unrolled sub-tiles expose independent roll chains
    (the kernel's cost is latency-bound, see PERF.md)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    x = nb
    for k in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane >= k, _roll_down(x, k, 1), 0)
    row_tot = jax.lax.broadcast_in_dim(x[:, 127], (8, 128), (0,))
    rsum = row_tot
    for k in (1, 2, 4):
        rsum = rsum + jnp.where(subl >= k, _roll_down(rsum, k, 0), 0)
    row_base = rsum - row_tot  # exclusive row prefix, broadcast over lanes
    return x + row_base, rsum


def _tile_contrib(v, nb, c0, n_words, incl=None, rsum=None):
    """Steps 1-3 for one [8, 128] token tile starting at bit offset c0:
    per-token offsets, hi/lo word contributions, keyed XOR segment
    combine. Returns (hi_c, lo_c, w0, seg_last, tile_bits). Pass a
    precomputed (incl, rsum) from _tile_scan to skip step 1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    if incl is None:
        incl, rsum = _tile_scan(nb)
    off = c0 + incl - nb  # global exclusive bit offset per token
    tile_bits = rsum[7, 0]  # rsum[7, *] = tile total bits

    # 2. hi/lo word contributions
    # min computed in i32: Mosaic has no arith.minui legalization
    nb_clip = jnp.minimum(nb, 31).astype(jnp.uint32)
    mask = jnp.where(
        nb >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << nb_clip) - jnp.uint32(1),
    )
    vm = v & mask
    sh_end = (off & 31) + nb  # (0, 63]
    sh_hi = jnp.where(sh_end <= 32, 32 - sh_end, 0).astype(jnp.uint32)
    hi = jnp.where(
        sh_end <= 32,
        vm << sh_hi,
        vm >> jnp.clip(sh_end - 32, 0, 31).astype(jnp.uint32),
    )
    lo = jnp.where(
        sh_end > 32,
        vm << jnp.clip(64 - sh_end, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    live = nb > 0
    hi = jnp.where(live, hi, jnp.uint32(0))
    lo = jnp.where(live, lo, jnp.uint32(0))
    w0 = off >> 5

    # 3. XOR-scan of hi keyed by target word, along lanes. w0 is
    # non-decreasing within a row, so "same segment" == "equal w0"; the
    # keyed form needs no i1 flag vector (Mosaic cannot rotate i1 data).
    xs = hi
    for k in (1, 2, 4, 8, 16, 32, 64):
        ok = (lane >= k) & (w0 == _roll_down(w0, k, 1))
        xs = jnp.where(ok, xs ^ _roll_down(xs, k, 1), xs)
    nxt_w0 = _roll_down(w0, 127, 1)  # w0 of next lane (roll by -1 mod 128)
    seg_last = (lane == 127) | (w0 != nxt_w0)
    # drop contributions past the arena bound the same way pack_tokens
    # does (hi lands at w0, lo at w0 + 1)
    hi_c = jnp.where(seg_last & (w0 < n_words), xs, jnp.uint32(0))
    lo_c = jnp.where(seg_last & (w0 + 1 < n_words), lo, jnp.uint32(0))

    return hi_c, lo_c, w0, seg_last, tile_bits


def _scatter_window(hi_c, lo_c, w0, seg_last, a, win, n_words):
    """Steps 4: one-hot byte-plane matmul scatter into a win-word aligned
    window based at a. Returns the window's XOR contribution W [win]."""
    w0a = jnp.where(
        seg_last & (w0 < n_words), w0 - a, -1
    )  # window-relative slot, or -1 (no segment / dropped)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (8, win, 128), 1)
    onehot = (w0a[:, None, :] == jidx).astype(jnp.bfloat16)

    # all 8 byte planes ride one batched matmul: rhs [8, 128tok, 128k]
    # carries plane k of token t at [.., t, k] (lanes 0-3 = hi bytes,
    # 4-7 = lo bytes, rest zero). Built by broadcast+select in i32 —
    # Mosaic miscompiles minor-dim stack/convert packing (plane 2 of a
    # [8,128,8] stacked operand read back as zeros on v5e; bisected on
    # hardware), but plain i32 broadcasts and a minor-dim-128 layout are
    # its bread and butter.
    lanek = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    hi_b = jax.lax.broadcast_in_dim(
        hi_c.astype(jnp.int32), (8, 128, 128), (0, 1)
    )
    lo_b = jax.lax.broadcast_in_dim(
        lo_c.astype(jnp.int32), (8, 128, 128), (0, 1)
    )
    src = jnp.where(lanek < 4, hi_b, jnp.where(lanek < 8, lo_b, 0))
    planes = ((src >> ((lanek & 3) * 8)) & 0xFF).astype(jnp.bfloat16)
    res = jax.lax.dot_general(
        onehot,
        planes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [8, win, 128]
    resi = jnp.sum(res, axis=0).astype(jnp.int32)  # [win, 128]
    lanew = jax.lax.broadcasted_iota(jnp.int32, (win, 128), 1)
    shifted = resi << ((lanew & 3) * 8)
    hi_w = jnp.sum(
        jnp.where(lanew < 4, shifted, 0), axis=1, keepdims=True
    )  # [win, 1]
    lo_w = jnp.sum(
        jnp.where((lanew >= 4) & (lanew < 8), shifted, 0), axis=1, keepdims=True
    )
    # lo lands one word after its token's w0
    lo_sh = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), lo_w[: win - 1]], axis=0
    )
    return (hi_w ^ lo_sh).astype(jnp.uint32)[:, 0]  # [win]


def _apply_tile(v, nb, w_ref, bits_ref, carry, n_words, nwp, incl=None, rsum=None):
    """Shared tail of both kernels: contributions, carry update, and the
    windowed scatter + XOR RMW. A 512-word fast path covers typical tiles
    (avg code length <= ~12 bits); dense tiles fall back to the full
    WIN_T window. The span check reads the updated carry back from SMEM —
    scalar reads are safe where vector extracts feeding address math are
    not (etc/probe7.py bisection).
    """
    c0 = carry[0]
    hi_c, lo_c, w0, seg_last, tile_bits = _tile_contrib(
        v, nb, c0, n_words, incl, rsum
    )
    carry[0] = c0 + tile_bits
    bits_ref[0, 0, 0] = carry[0]
    a0 = ((c0 >> 5) >> 7) * 128  # 128-aligned word base of the whole tile
    c1 = carry[0]
    span = (c1 >> 5) + 2 - a0  # upper bound on words touched (incl. lo)

    lower = 0
    for win in WINDOWS:
        cond = (span > lower) & (span <= win) if lower else span <= win
        if win == WINDOWS[-1]:
            cond = span > lower

        @pl.when(cond)
        def _(win=win):
            a = jnp.minimum(a0, nwp - win)
            a = pl.multiple_of(a, 128)
            W = _scatter_window(hi_c, lo_c, w0, seg_last, a, win, n_words)
            cur = w_ref[0, 0, pl.ds(a, win)]
            w_ref[0, 0, pl.ds(a, win)] = cur ^ W

        lower = win


def _pack_kernel(v_ref, nb_ref, w_ref, bits_ref, carry, *, n_words, nwp, unroll):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        bits_ref[0, 0, 0] = 0
        carry[0] = 0

    # phase-split like the byte kernel: the carry-independent scans of all
    # sub-tiles first (independent roll chains overlap), then the
    # carry-chained scatters. All-zero tiles (e.g. the padded tail of
    # variable-length token streams) skip the scatter entirely.
    pre = []
    for u in range(unroll):
        v = v_ref[0, 0, u].astype(jnp.uint32)  # [8, 128]
        nb = nb_ref[0, 0, u].astype(jnp.int32)
        incl, rsum = _tile_scan(nb)
        pre.append((v, nb, incl, rsum))
    for v, nb, incl, rsum in pre:

        @pl.when(rsum[7, 0] > 0)
        def _(v=v, nb=nb, incl=incl, rsum=rsum):
            _apply_tile(v, nb, w_ref, bits_ref, carry, n_words, nwp, incl, rsum)


def _pack_bytes_kernel(
    by_ref, tv_ref, tn_ref, hdr_ref, sc_ref, w_ref, bits_ref, carry, *, n_words, nwp
):
    """Fused per-symbol table lookup + bit pack.

    by_ref [1,1,8,128] i32 byte tile; tv_ref/tn_ref [1,256] i32 per-block
    codeword/width tables; hdr_ref [1,1,NWp] u32 pre-packed header arena;
    sc_ref [1,2] SMEM (header_bits, n_valid). The token stream becomes
    table[byte] for live positions — the whole encode path after table
    construction runs in this one kernel, so no (value, nbits) token
    arrays ever touch HBM.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = hdr_ref[...]
        carry[0] = sc_ref[0, 0, 0]

    # UNROLL tiles per grid step amortize per-step overheads (input DMA
    # latency, loop bookkeeping); the SMEM carry checkpoints between
    # sub-tiles keep each window base scalar-derived.
    sym = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 256), 2)
    tv = tv_ref[0][None, :, :]  # [1,1,256] i32
    tn = tn_ref[0][None, :, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    # phase A: lookups + nb prefix scans for all sub-tiles — independent
    # of the SMEM carry, so their roll chains can overlap
    pre = []
    for u in range(UNROLL):
        by = by_ref[0, 0, u]  # [8, 128] i32
        # 256-way select lookup: VPU compare+reduce, no gather, no MXU
        oh = by[:, :, None] == sym
        v = jnp.sum(jnp.where(oh, tv, 0), axis=2).astype(jnp.uint32)
        nb = jnp.sum(jnp.where(oh, tn, 0), axis=2)  # [8,128]
        # mask tokens beyond the block's valid byte count
        tok = (t * UNROLL + u) * TILE + subl * 128 + lane
        nb = jnp.where(tok < sc_ref[0, 0, 1], nb, 0)
        incl, rsum = _tile_scan(nb)
        pre.append((v, nb, incl, rsum))
    # phase B: carry-chained contributions + scatter per sub-tile
    for v, nb, incl, rsum in pre:
        _apply_tile(v, nb, w_ref, bits_ref, carry, n_words, nwp, incl, rsum)


def _pack_bytes_packed_kernel(
    by_ref, tp_ref, hdr_ref, sc_ref, w_ref, bits_ref, carry, *, n_words, nwp, pack
):
    """Fused lookup + pack with `pack` bytes folded into each token.

    When every code length is <= 32/pack bits, `pack` adjacent bytes'
    codewords concatenate into one <=32-bit token (bit-stream equivalence:
    code concatenation is associative), dividing the scan + scatter work
    and the grid-step count by `pack`. The (code, len) pair also rides ONE
    packed i32 table entry ((code << 6) | len), halving the 256-way select
    cost vs the two-table kernel. by_ref [1,1,UNROLL,pack,8,128] holds
    plane p = bytes at flat index token*pack + p.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = hdr_ref[...]
        carry[0] = sc_ref[0, 0, 0]

    sym = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 256), 2)
    tp = tp_ref[0][None, :, :]  # [1,1,256] i32 packed (code<<6)|len
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    n_valid_s = sc_ref[0, 0, 1]
    pre = []
    for u in range(UNROLL):
        acc_v = jnp.zeros((8, 128), jnp.uint32)
        acc_n = jnp.zeros((8, 128), jnp.int32)
        tok = (t * UNROLL + u) * TILE + subl * 128 + lane
        for p in range(pack):
            by = by_ref[0, 0, u, p]  # [8, 128] i32
            oh = by[:, :, None] == sym
            packed = jnp.sum(jnp.where(oh, tp, 0), axis=2)
            vp = (packed >> 6).astype(jnp.uint32)
            np_ = packed & 63
            live = tok * pack + p < n_valid_s
            vp = jnp.where(live, vp, jnp.uint32(0))
            np_ = jnp.where(live, np_, 0)
            # MSB-first: earlier byte's code sits above the later one
            acc_v = (acc_v << np_.astype(jnp.uint32)) | vp
            acc_n = acc_n + np_
        incl, rsum = _tile_scan(acc_n)
        pre.append((acc_v, acc_n, incl, rsum))
    for v, nb, incl, rsum in pre:
        _apply_tile(v, nb, w_ref, bits_ref, carry, n_words, nwp, incl, rsum)


def pack_bytes_blocks_pallas(
    blocks,
    n_valid,
    table_vals,
    table_bits,
    hdr_words,
    hdr_bits,
    n_words: int,
    interpret: bool = False,
    pack: int = 1,
):
    """Fused encode: [B, bs] u8 blocks + per-block symbol tables + packed
    header arenas -> ([B, n_words] u32, [B] total_bits).

    Equivalent to: tokens = (table_vals[b, c], table_bits[b, c]) for each
    live byte, appended after the header bit stream, packed MSB-first
    (io/BitOStream.hpp:79-88). hdr_words must hold the header's packed
    words (hdr_bits bits); symbol bits continue at offset hdr_bits.

    pack > 1 folds `pack` adjacent bytes per token (packed-table kernel);
    the CALLER must guarantee every table_bits entry <= 32 // pack. Output
    is bit-identical across pack values.
    """
    B, bs = blocks.shape
    step = TILE * UNROLL * pack
    bsp = -(-bs // step) * step
    if bsp != bs:
        blocks = jnp.pad(blocks, ((0, 0), (0, bsp - bs)))
    T = bsp // step
    NWp = -(-n_words // 128) * 128 + WIN_T + 128

    hdr = jnp.zeros((B, 1, NWp), jnp.uint32)
    hdr = hdr.at[:, 0, : hdr_words.shape[1]].set(hdr_words)
    sc = jnp.stack(
        [hdr_bits.astype(jnp.int32), n_valid.astype(jnp.int32)], axis=1
    )[:, None, :]  # [B, 1, 2]

    if pack > 1:
        # plane p of token j = byte j*pack + p
        byp = (
            blocks.astype(jnp.int32)
            .reshape(B, T, UNROLL, TILE, pack)
            .transpose(0, 1, 2, 4, 3)
            .reshape(B, T, UNROLL, pack, 8, 128)
        )
        tpk = (table_vals.astype(jnp.int32) << 6) | table_bits.astype(jnp.int32)
        words, bits = pl.pallas_call(
            partial(
                _pack_bytes_packed_kernel, n_words=n_words, nwp=NWp, pack=pack
            ),
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, UNROLL, pack, 8, 128),
                    lambda b, t: (b, t, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 256), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, 2), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, NWp), jnp.uint32),
                jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=interpret,
        )(byp, tpk[:, None, :], hdr, sc)
        return words[:, 0, :n_words], bits[:, 0, 0]

    by4 = blocks.astype(jnp.int32).reshape(B, T, UNROLL, 8, 128)
    words, bits = pl.pallas_call(
        partial(_pack_bytes_kernel, n_words=n_words, nwp=NWp),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, UNROLL, 8, 128),
                lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 256), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 256), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 2), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, NWp), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(
        by4,
        table_vals.astype(jnp.int32)[:, None, :],
        table_bits.astype(jnp.int32)[:, None, :],
        hdr,
        sc,
    )
    return words[:, 0, :n_words], bits[:, 0, 0]


def _pad_tokens(values, nbits, step=TILE):
    B, NT = values.shape
    NTp = -(-NT // step) * step
    if NTp != NT:
        values = jnp.pad(values, ((0, 0), (0, NTp - NT)))
        nbits = jnp.pad(nbits, ((0, 0), (0, NTp - NT)))
    return values, nbits, NTp


@partial(jax.jit, static_argnums=(2, 3, 4))
def pack_blocks_pallas(values, nbits, n_words: int, interpret: bool = False, unroll: int = UNROLL):
    """Batched pack: [B, NT] (values, nbits) -> ([B, n_words] u32, [B] bits).

    Matches jax.vmap(pack_tokens)(values, nbits) bit-exactly; tokens beyond
    a block's stream get nbits 0.
    """
    B, NT = values.shape
    if NT == 0:
        return (
            jnp.zeros((B, n_words), jnp.uint32),
            jnp.zeros((B,), jnp.int32),
        )
    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    values, nbits, NTp = _pad_tokens(values, nbits, TILE * unroll)
    T = NTp // (TILE * unroll)
    NWp = -(-n_words // 128) * 128 + WIN_T + 128

    v4 = values.reshape(B, T, unroll, 8, 128)
    n4 = nbits.reshape(B, T, unroll, 8, 128)
    words, bits = pl.pallas_call(
        partial(_pack_kernel, n_words=n_words, nwp=NWp, unroll=unroll),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, unroll, 8, 128),
                lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, unroll, 8, 128),
                lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, NWp), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(v4, n4)
    return words[:, 0, :n_words], bits[:, 0, 0]
