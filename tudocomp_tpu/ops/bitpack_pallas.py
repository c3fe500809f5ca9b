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
  3. per 128-token row: segmented XOR-scan by target word (only the last
     token of a segment can straddle, so interior lo parts are zero);
     segment-last lanes hold each word's combined contribution
  4. scatter within the row via a one-hot byte-plane matmul
     onehot[384, 128] @ planes[128, 8] on the MXU (j = word slot relative
     to the row's 128-aligned base; bit-disjoint contributions make
     sum == or, byte planes keep everything exact in bf16/f32)
  5. XOR read-modify-write of the 384-word aligned window into the
     VMEM-resident output arena (one per row; rows/tiles/blocks sharing a
     boundary word compose through the XOR)

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

TILE = 1024  # tokens per grid step, shaped [8, 128]
WIN_T = 1280  # aligned window per 1024-token tile (1024 words + 129 + align slack)


def _roll_down(x, k, axis):
    """x shifted so element i reads element i-k (no wrap: masked later)."""
    return pltpu.roll(x, k, axis=axis)


def _pack_kernel(v_ref, nb_ref, w_ref, bits_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        carry[0] = 0

    v = v_ref[0, 0].astype(jnp.uint32)  # [8, 128]
    nb = nb_ref[0, 0].astype(jnp.int32)  # [8, 128]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    # 1. inclusive sum-scan of nb in flat (row-major) token order
    x = nb
    for k in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane >= k, _roll_down(x, k, 1), 0)
    row_tot = jax.lax.broadcast_in_dim(x[:, 127], (8, 128), (0,))
    rsum = row_tot
    for k in (1, 2, 4):
        rsum = rsum + jnp.where(subl >= k, _roll_down(rsum, k, 0), 0)
    row_base = rsum - row_tot  # exclusive row prefix, broadcast over lanes
    c0 = carry[0]
    incl = x + row_base
    off = c0 + incl - nb  # global exclusive bit offset per token
    carry[0] = c0 + rsum[7, 0]  # rsum[7, *] = tile total bits
    bits_ref[0, 0, 0] = carry[0]

    # 2. hi/lo word contributions
    nbu = nb.astype(jnp.uint32)
    mask = jnp.where(
        nb >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << jnp.minimum(nbu, 31)) - jnp.uint32(1),
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

    # 3. segmented XOR-scan of hi by target word, along lanes
    head = (lane == 0) | (w0 != _roll_down(w0, 1, 1))
    xs, f = hi, head
    for k in (1, 2, 4, 8, 16, 32, 64):
        ok = lane >= k
        xk = _roll_down(xs, k, 1)
        fk = _roll_down(f, k, 1)
        xs = jnp.where(ok & ~f, xs ^ xk, xs)
        f = f | (ok & fk)
    nxt_w0 = _roll_down(w0, 127, 1)  # w0 of next lane (roll by -1 mod 128)
    seg_last = (lane == 127) | (w0 != nxt_w0)
    hi_c = jnp.where(seg_last, xs, jnp.uint32(0))
    lo_c = jnp.where(seg_last, lo, jnp.uint32(0))

    # 4. one-hot byte-plane matmul scatter into the tile's aligned window.
    # The window base derives from the SMEM carry scalar alone (a dynamic
    # store base computed from a vector extract crashes the Mosaic
    # compiler; an SMEM-scalar base is fine — etc/probe7.py bisection).
    a = ((c0 >> 5) >> 7) * 128  # 128-aligned word base of the whole tile
    w0a = jnp.where(seg_last, w0 - a, -1)  # 0..1151, or -1 (no segment)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (8, WIN_T, 128), 1)
    onehot = (w0a[:, None, :] == jidx).astype(jnp.bfloat16)

    def planes_of(c):
        return jnp.stack(
            [
                (c & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                ((c >> 8) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                ((c >> 16) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                ((c >> 24) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
            ],
            axis=2,
        )

    planes = jnp.concatenate([planes_of(hi_c), planes_of(lo_c)], axis=2)
    res = jax.lax.dot_general(
        onehot,
        planes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [8, WIN_T, 8]
    resi = jnp.sum(res, axis=0).astype(jnp.int32).astype(jnp.uint32)  # [WIN_T, 8]
    hi_w = (
        resi[:, 0] | (resi[:, 1] << 8) | (resi[:, 2] << 16) | (resi[:, 3] << 24)
    )
    lo_w = (
        resi[:, 4] | (resi[:, 5] << 8) | (resi[:, 6] << 16) | (resi[:, 7] << 24)
    )
    # lo lands one word after its token's w0
    lo_sh = jnp.concatenate([jnp.zeros((1,), jnp.uint32), lo_w[: WIN_T - 1]])
    W = hi_w ^ lo_sh  # [WIN_T]

    # 5. one aligned XOR RMW per tile
    a = pl.multiple_of(a, 128)
    cur = w_ref[0, 0, pl.ds(a, WIN_T)]
    w_ref[0, 0, pl.ds(a, WIN_T)] = cur ^ W


def _pad_tokens(values, nbits):
    B, NT = values.shape
    NTp = -(-NT // TILE) * TILE
    if NTp != NT:
        values = jnp.pad(values, ((0, 0), (0, NTp - NT)))
        nbits = jnp.pad(nbits, ((0, 0), (0, NTp - NT)))
    return values, nbits, NTp


@partial(jax.jit, static_argnums=(2, 3))
def pack_blocks_pallas(values, nbits, n_words: int, interpret: bool = False):
    """Batched pack: [B, NT] (values, nbits) -> ([B, n_words] u32, [B] bits).

    Matches jax.vmap(pack_tokens)(values, nbits) bit-exactly; tokens beyond
    a block's stream get nbits 0.
    """
    B, NT = values.shape
    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    values, nbits, NTp = _pad_tokens(values, nbits)
    T = NTp // TILE
    NWp = -(-n_words // 128) * 128 + WIN_T + 128

    v4 = values.reshape(B, T, 8, 128)
    n4 = nbits.reshape(B, T, 8, 128)
    words, bits = pl.pallas_call(
        _pack_kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
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
