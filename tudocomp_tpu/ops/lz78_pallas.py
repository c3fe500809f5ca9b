"""Device LZ78 parse: 128 blocks in lockstep per Pallas program.

The LZ78 trie parse is sequential in its dictionary (SURVEY.md §7 step 4;
reference shape lz78/HashTrie.hpp:14 + squeeze_node key packing), which is
hostile to a machine with no per-lane gather. This kernel vectorizes it
across BLOCKS instead of within one: 128 independent blocks ride the 128
vector lanes, all advancing exactly one input byte per loop step.

Two observations make the lockstep design work:

1. Content-addressed dictionary. Instead of a hash table (whose probe
   loops would de-synchronize lanes), the dictionary IS the emitted factor
   list: factor i of a block is its trie node i+1, created as (parent
   node, char). A lookup for (node, c) scans the emit arrays for the
   packed key node*256+c — a [bs, 128] compare+select+reduce, pure VPU,
   identical lane-count work every step. Keys are unique per block, and
   rows not yet written hold -1, so no bounds masking is needed.

2. Scalar-synchronous addressing. Because lookups take one step regardless
   of outcome, every lane consumes byte i at loop step i. The text read
   and the emit-row write therefore use the loop counter — a scalar-base
   dynamic slice on the sublane dimension, the one dynamic access Mosaic
   loves — and never a per-lane index.

Per-block outputs are bit-identical to the host parse (native
tdc_lz78_parse), including the trailing partial factor re-emission
(compressors/LZ78Compressor.hpp:124-131).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_BS = 1 << 13  # parent ids must fit 13 bits next to an 8-bit char


def _lz78_kernel(text_ref, nv_ref, ekey_ref, eid_ref, nf_ref):
    bs = text_ref.shape[1]
    nv = nv_ref[0]  # [1, 128]

    ekey_ref[...] = jnp.full(ekey_ref.shape, -1, jnp.int32)
    eid_ref[0] = jnp.zeros((bs + 8, LANES), jnp.int32)

    riota = jax.lax.broadcasted_iota(jnp.int32, (bs + 8, LANES), 0)

    def body(i, carry):
        node, nf = carry  # [1, 128] each
        c = text_ref[0, pl.ds(i, 1), :]  # [1, 128]
        key = node * 256 + c
        ek = ekey_ref[0]  # [bs + 8, 128]
        hit = ek == key  # key >= 0, unwritten rows are -1
        match_id = jnp.sum(
            jnp.where(hit, eid_ref[0], 0), axis=0, keepdims=True
        )  # [1, 128]
        live = i < nv
        found = live & (match_id > 0)
        miss = live & (match_id == 0)
        ekey_ref[0, pl.ds(i, 1), :] = jnp.where(miss, key, -1)
        eid_ref[0, pl.ds(i, 1), :] = jnp.where(miss, nf + 1, 0)
        node = jnp.where(found, match_id, jnp.where(miss, 0, node))
        nf = nf + miss.astype(jnp.int32)
        return node, nf

    node, nf = jax.lax.fori_loop(
        0,
        bs,
        body,
        (jnp.zeros((1, LANES), jnp.int32), jnp.zeros((1, LANES), jnp.int32)),
    )

    # trailing partial factor: re-emit the key that created `node`
    # (LZ78Compressor.hpp:124-131 emits (parent(node), char(node)))
    pending = node > 0
    hit = eid_ref[0] == jnp.where(pending, node, -1)
    tkey = jnp.sum(jnp.where(hit, ekey_ref[0], 0), axis=0, keepdims=True)
    ekey_ref[0, pl.ds(bs, 1), :] = jnp.where(pending, tkey, -1)
    nf = nf + pending.astype(jnp.int32)
    nf_ref[0] = jnp.broadcast_to(nf, (8, LANES))


@partial(jax.jit, static_argnums=(2,))
def _lz78_parse_groups(texts, n_valid, interpret=False):
    """[G, bs, 128] i32 texts + [G, 1, 128] valid -> (ekey [G, bs+8, 128],
    nf [G, 128])."""
    G, bs, _ = texts.shape
    ekey, _eid, nf = pl.pallas_call(
        _lz78_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, bs + 8, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bs + 8, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, bs + 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, bs + 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(texts, n_valid)
    return ekey, nf[:, 0, :]


def _lzw_kernel(text_ref, nv_ref, ekey_ref, eid_ref, eout_ref, nf_ref):
    """LZW variant of the lockstep parse (LZWCompressor.hpp:38-105): the
    dictionary is pre-seeded with the 256 roots (implicit — a phrase
    restarts at node = c, so roots never enter the scanned table); each
    miss emits the CURRENT node id and creates node 256 + nf."""
    bs = text_ref.shape[1]
    nv = nv_ref[0]  # [1, 128]

    ekey_ref[...] = jnp.full(ekey_ref.shape, -1, jnp.int32)
    eid_ref[0] = jnp.zeros((bs + 8, LANES), jnp.int32)
    eout_ref[...] = jnp.full(eout_ref.shape, -1, jnp.int32)

    node0 = text_ref[0, pl.ds(0, 1), :]  # [1, 128]

    def body(i, carry):
        node, nf = carry
        c = text_ref[0, pl.ds(i, 1), :]
        key = node * 256 + c
        hit = ekey_ref[0] == key
        match = jnp.sum(jnp.where(hit, eid_ref[0], 0), axis=0, keepdims=True)
        live = i < nv
        found = live & (match > 0)
        miss = live & (match == 0)
        ekey_ref[0, pl.ds(i, 1), :] = jnp.where(miss, key, -1)
        eid_ref[0, pl.ds(i, 1), :] = jnp.where(miss, 256 + nf, 0)
        eout_ref[0, pl.ds(i, 1), :] = jnp.where(miss, node, -1)
        node = jnp.where(found, match, jnp.where(miss, c, node))
        nf = nf + miss.astype(jnp.int32)
        return node, nf

    node, nf = jax.lax.fori_loop(
        1, bs, body, (node0, jnp.zeros((1, LANES), jnp.int32))
    )
    # final phrase: always emitted for non-empty blocks
    nonempty = nv >= 1
    eout_ref[0, pl.ds(bs, 1), :] = jnp.where(nonempty, node, -1)
    nf = nf + nonempty.astype(jnp.int32)
    nf_ref[0] = jnp.broadcast_to(nf, (8, LANES))


@partial(jax.jit, static_argnums=(2,))
def _lzw_parse_groups(texts, n_valid, interpret=False):
    G, bs, _ = texts.shape
    _ekey, _eid, eout, nf = pl.pallas_call(
        _lzw_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (1, shp, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            )
            for shp in (bs + 8, bs + 8, bs + 8, 8)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((G, shp, LANES), jnp.int32)
            for shp in (bs + 8, bs + 8, bs + 8, 8)
        ),
        interpret=interpret,
    )(texts, n_valid)
    return eout, nf[:, 0, :]


def lzw_parse_blocks_device(blocks, n_valid=None, interpret=None):
    """Parse B blocks on device: [B, bs] u8 -> list of LZW code arrays,
    bit-identical to the host lzw_parse of each block."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    B, bs = blocks.shape
    assert bs <= MAX_BS, "device lzw block size capped at 8 KiB"
    if n_valid is None:
        n_valid = np.full(B, bs, np.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bp = -(-B // LANES) * LANES
    G = Bp // LANES
    texts = np.zeros((Bp, bs), np.int32)
    texts[:B] = blocks
    nv = np.zeros(Bp, np.int32)
    nv[:B] = n_valid
    texts = texts.reshape(G, LANES, bs).transpose(0, 2, 1)
    nvg = nv.reshape(G, 1, LANES)
    eout, nf = _lzw_parse_groups(jnp.asarray(texts), jnp.asarray(nvg), interpret)
    eout = np.asarray(eout)
    nf = np.asarray(nf)
    out = []
    for b in range(B):
        g, lane = divmod(b, LANES)
        col = eout[g, :, lane]
        codes = col[col >= 0].astype(np.uint32)
        assert len(codes) == nf[g, lane], (b, len(codes), nf[g, lane])
        out.append(codes)
    return out


def lz78_parse_blocks_device(blocks, n_valid=None, interpret=None):
    """Parse B blocks on device: [B, bs] u8 -> list of (parents, chars).

    Factors are bit-identical to the host parse of each block. bs must be
    <= 8192 (VMEM + key packing); blocks beyond multiples of 128 are
    padded out internally.
    """
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    B, bs = blocks.shape
    assert bs <= MAX_BS, "device lz78 block size capped at 8 KiB"
    if n_valid is None:
        n_valid = np.full(B, bs, np.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bp = -(-B // LANES) * LANES
    G = Bp // LANES
    texts = np.zeros((Bp, bs), np.int32)
    texts[:B] = blocks
    nv = np.zeros(Bp, np.int32)
    nv[:B] = n_valid
    # lane-major layout: block b -> group b // 128, lane b % 128
    texts = texts.reshape(G, LANES, bs).transpose(0, 2, 1)
    nvg = nv.reshape(G, 1, LANES)
    ekey, nf = _lz78_parse_groups(
        jnp.asarray(texts), jnp.asarray(nvg), interpret
    )
    ekey = np.asarray(ekey)  # [G, bs+8, 128]
    nf = np.asarray(nf)  # [G, 128]
    out = []
    for b in range(B):
        g, lane = divmod(b, LANES)
        col = ekey[g, :, lane]
        keys = col[col >= 0]
        assert len(keys) == nf[g, lane], (b, len(keys), nf[g, lane])
        out.append(
            ((keys >> 8).astype(np.uint32), (keys & 0xFF).astype(np.uint8))
        )
    return out
