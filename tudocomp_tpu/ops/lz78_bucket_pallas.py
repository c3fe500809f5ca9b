"""Device LZ78 parse with a bucketed VMEM hash dictionary — large blocks.

The lockstep kernel in lz78_pallas.py vectorizes across 128 blocks but
pays an O(bs)-per-byte content scan, capping useful block sizes at 8 KiB
(and with them the compression ratio: 38% vs 19% whole-text on english).
Mosaic cannot do per-lane dynamic sublane addressing, so per-lane hash
tables are impossible — but per-BLOCK scalar addressing is exactly what it
supports (dynamic-slice bases from SMEM scalars).

This kernel therefore transposes the parallelism: ONE block per grid step,
and the 8x128 vector unit probes a whole hash BUCKET per input byte:

  dictionary     keys/ids [H, 8, 128] VMEM scratch — bucket h is an
                 (8,128) tile = 1024 slots, addressed by a scalar row
  probe          key = node*256 + c; h = mix(key) & (H-1); one [8,128]
                 compare + two [.,1] reductions give (matched id, fill)
  insert         at slot `fill` of the bucket via a predicated write;
                 full buckets chain to (h+1) & (H-1) — lookups stop at the
                 first non-full bucket (inserts fill chains in order)
  text/output    live in [rows, 128] tiles (a [*, 1] layout would pad the
                 lane dim 128x and blow VMEM); bytes stream through a
                 [1,128] window rolled one lane per step and reloaded
                 every 128 steps, factors accumulate in [1,128] windows
                 written back one full row at a time (keyed lane writes —
                 iota == nf % 128 — sidestep dynamic lane addressing)

Scalars cross the vector/SMEM boundary via the store-extract-reload idiom
(the one Mosaic supports — see the Mosaic notes in PERF.md). Per-byte work
is a handful of vector ops regardless of bs, so block sizes up to 256 KiB
(VMEM: dictionary + tiles ~8 MiB) run at host-competitive speed with
near-whole-text ratios. Outputs are bit-identical to the host parse
(native tdc_lz78_parse semantics, LZ78Compressor.hpp:42-159, trailing
partial factor included).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BS = 1 << 18  # 256 KiB blocks
_SUB, _LN = 8, 128
_BSLOTS = _SUB * _LN  # 1024 slots per bucket


def _lz78_bucket_kernel(H, rows, orow, text_ref, nv_ref, par_ref, chr_ref,
                        nf_ref, keys_ref, ids_ref, sm_ref):
    b = pl.program_id(0)
    nv = nv_ref[b, 0]
    bs = rows * _LN

    keys_ref[...] = jnp.full(keys_ref.shape, -1, jnp.int32)
    # ids must be cleared too: the trailing-factor recovery scans ids for
    # the pending node id, and stale entries from the previous grid step
    # would alias it
    ids_ref[...] = jnp.zeros(ids_ref.shape, jnp.int32)
    iota2 = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LN), 0) * _LN
        + jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LN), 1)
    )
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LN), 1)

    def to_scalar(slot, vec11):
        # store-extract-reload: the Mosaic-legal vector->scalar path
        sm_ref[slot] = vec11[0, 0]
        return sm_ref[slot]

    def bucket_scan(h, key_s):
        """ONE reduction gives both the matched id and the bucket fill:
        combo = mid | fill << 21 (ids < 2^18+1 slack, fill <= 1024). One
        SMEM round trip per probe instead of two."""
        krow = keys_ref[h]  # [8, 128]
        hit = krow == key_s  # scalar broadcast
        v = jnp.where(hit, ids_ref[h], 0) + (
            (krow != -1).astype(jnp.int32) << 21
        )
        combo2 = jnp.sum(v, axis=(0, 1), keepdims=True)[:, :1]
        combo = to_scalar(1, combo2)
        return combo & ((1 << 21) - 1), combo >> 21

    def insert_at(h, fill_s, key_s, fid):
        sel = iota2 == fill_s
        keys_ref[h] = jnp.where(sel, key_s, keys_ref[h])
        ids_ref[h] = jnp.where(sel, fid, ids_ref[h])

    def probe(key_s, fid, live):
        """Walk the bucket chain for scalar key `key_s`; returns matched
        id (0 = miss) as a scalar. Inserts (key, fid) at the chain's
        first free slot when live and missing. The first bucket probe is
        inlined (load factor <= 0.5 makes chains rare); the chain walk
        and the insert sit behind real branches so hit-only bytes pay a
        single read + reduce."""
        ku = key_s.astype(jnp.uint32)
        h0 = ((ku * jnp.uint32(2654435761)) >> jnp.uint32(13)).astype(
            jnp.int32
        ) & (H - 1)
        mid_s, fill_s = bucket_scan(h0, key_s)
        sm_ref[6] = mid_s

        @pl.when((mid_s == 0) & (fill_s >= _BSLOTS))
        def _():  # rare: first bucket full and no hit — walk the chain
            def cond(st):
                _h, done = st
                return done == 0

            def body(st):
                h, _done = st
                m_s, f_s = bucket_scan(h, key_s)
                full = f_s >= _BSLOTS

                @pl.when(live & (m_s == 0) & (~full))
                def _():
                    insert_at(h, f_s, key_s, fid)

                sm_ref[6] = m_s
                done = ((m_s > 0) | (~full)).astype(jnp.int32)
                return (h + 1) & (H - 1), done

            jax.lax.while_loop(
                cond, body, ((h0 + 1) & (H - 1), jnp.int32(0))
            )

        @pl.when(live & (mid_s == 0) & (fill_s < _BSLOTS))
        def _():  # common miss: insert into the first bucket
            insert_at(h0, fill_s, key_s, fid)

        return sm_ref[6]

    def emit(do, p_s, c_s, nf, wpar, wchr):
        """Append factor (p_s, c_s) at slot nf when `do`; flush full rows."""
        slot = nf - (nf // _LN) * _LN
        sel = do & (lane1 == slot)
        wpar = jnp.where(sel, p_s, wpar)
        wchr = jnp.where(sel, c_s, wchr)

        @pl.when(do & (slot == _LN - 1))
        def _():
            r = nf // _LN
            par_ref[0, pl.ds(r, 1), :] = wpar
            chr_ref[0, pl.ds(r, 1), :] = wchr

        return nf + do.astype(jnp.int32), wpar, wchr

    def step(i, carry):
        node_s, nf, wtext, wpar, wchr = carry
        row = i // _LN
        at_row = i - row * _LN == 0
        wtext = jnp.where(at_row, text_ref[0, pl.ds(row, 1), :], wtext)
        c_s = to_scalar(4, wtext[:, :1])
        wtext = jnp.roll(wtext, -1, axis=1)
        key_s = node_s * 256 + c_s
        live = i < nv
        mid_s = probe(key_s, nf + 1, live)
        found = live & (mid_s > 0)
        miss = live & (mid_s == 0)
        nf, wpar, wchr = emit(miss, node_s, c_s, nf, wpar, wchr)
        # dead steps (i >= nv, zero padding) must not touch the pending
        # node — the trailing-factor emission reads it after the loop
        node_s = jnp.where(found, mid_s, jnp.where(miss, 0, node_s))
        return node_s, nf, wtext, wpar, wchr

    zrow = jnp.zeros((1, _LN), jnp.int32)
    node_s, nf, _wt, wpar, wchr = jax.lax.fori_loop(
        0, bs, step, (jnp.int32(0), jnp.int32(0), zrow, zrow, zrow)
    )

    # trailing partial factor (LZ78Compressor.hpp:124-131): node > 0 means
    # the input ended mid-phrase; emit (parent(node), char(node)). Recover
    # the creating key by scanning ids for node — one table pass per block.
    def find_body(h, acc):
        hit = ids_ref[h] == node_s
        k2 = jnp.sum(
            jnp.where(hit, keys_ref[h], 0), axis=(0, 1), keepdims=True
        )[:, :1]
        return acc + to_scalar(5, k2)

    key2 = jax.lax.fori_loop(0, H, find_body, jnp.int32(0))
    nf, wpar, wchr = emit(node_s > 0, key2 // 256, key2 % 256, nf, wpar, wchr)

    # final partial-row flush (lanes beyond nf % 128 are garbage; the host
    # slices by nf)
    @pl.when(nf - (nf // _LN) * _LN > 0)
    def _():
        r = nf // _LN
        par_ref[0, pl.ds(r, 1), :] = wpar
        chr_ref[0, pl.ds(r, 1), :] = wchr

    nf_ref[b, 0] = nf


def _table_rows(bs: int) -> int:
    # >= 2x slots per possible factor (factors <= bs), min 64 buckets
    need = max(64, (2 * bs + _BSLOTS - 1) // _BSLOTS)
    return 1 << (need - 1).bit_length()


@partial(jax.jit, static_argnums=(2, 3))
def _parse_blocks(texts, n_valid, bs, interpret=False):
    """[B, bs/128, 128] i32 texts, [B, 1] n_valid ->
    (par, chr [B, orow, 128], nf [B, 1])."""
    B = texts.shape[0]
    rows = texts.shape[1]
    orow = rows + 1  # factors <= bs; one slack row for the trailing factor
    H = _table_rows(bs)
    kern = partial(_lz78_bucket_kernel, H, rows, orow)
    par, chr_, nf = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, _LN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, orow, _LN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, orow, _LN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, orow, _LN), jnp.int32),
            jax.ShapeDtypeStruct((B, orow, _LN), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, _SUB, _LN), jnp.int32),
            pltpu.VMEM((H, _SUB, _LN), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
        ],
        interpret=interpret,
    )(texts, n_valid)
    return par, chr_, nf


def lz78_parse_blocks_bucket(blocks, n_valid=None, interpret=None):
    """Parse B blocks on device: [B, bs] u8 -> list of (parents, chars),
    bit-identical to the host parse of each block. bs <= 256 KiB."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    B, bs0 = blocks.shape
    assert bs0 <= MAX_BS, "bucket lz78 block size capped at 256 KiB"
    if n_valid is None:
        n_valid = np.full(B, bs0, np.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs = -(-bs0 // _LN) * _LN  # pad to a lane multiple
    texts = np.zeros((B, bs), np.int32)
    texts[:, :bs0] = blocks
    texts = texts.reshape(B, bs // _LN, _LN)
    nv = jnp.asarray(np.asarray(n_valid, np.int32)[:, None])
    par, chr_, nf = _parse_blocks(jnp.asarray(texts), nv, bs, interpret)
    par = np.asarray(par).reshape(B, -1)
    chr_ = np.asarray(chr_).reshape(B, -1)
    nf = np.asarray(nf)[:, 0]
    out = []
    for b in range(B):
        k = int(nf[b])
        out.append(
            (par[b, :k].astype(np.uint32), chr_[b, :k].astype(np.uint8))
        )
    return out
