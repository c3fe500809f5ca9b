"""Bit-serial lockstep device Huffman decode (Pallas TPU).

Replaces the jump-table + pointer-doubling decode (ops/huffman_decode.py,
~0.8 MB/s on v5e: O(n log n) random global gathers are structurally wrong
for the TPU memory system). Entropy decode is sequential per stream, so
the parallelism axis is BLOCKS: 1024 independent per-block streams ride
the (8, 128) lane grid, and every lane consumes exactly ONE BIT per step
— all lanes therefore read the SAME word column index each step, which
turns the per-lane bitstream fetch into a regular VMEM slice (no gather
anywhere in the hot loop; the LZ78 lockstep kernel proves this shape,
ops/lz78_pallas.py).

Per bit-step, per lane (the canonical first-match rule of
coders/huffman.py:246-254 / HuffmanCoder.hpp:584-613):

    acc = acc*2 + bit; len += 1
    complete = acc >= firstcode[len]          (32-way table select)
    rank     = acc + (psl[len] - firstcode[len])
    sym      = sym_table[rank]                (64-way select over 4-byte-
                                               packed entries + shift)

Completed symbols fold into 4-step output groups (4 steps complete at
most 4 codes of 8 output bits = 32 bits, so one u32 token always holds a
group); the groups stream to HBM as (value, nbits) token arrays and a
second pass — the existing bit-pack kernel, pack_blocks_pallas — compacts
them into the decoded byte arena. Both passes are lockstep Pallas; the
only per-element XLA work is a transpose.

Degenerate (single-symbol / empty-alphabet) blocks decode through the
same tables: raw 8-bit literals are exactly a canonical code with
firstcode[8] = 0 and an identity symbol map.

Code lengths <= 31 are guaranteed by the encoder for blocks <= 2 MiB
(ops/huffman_jax.py MAX_BLOCK).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.bitio import BitReader
from .bitpack import words_to_bytes

__all__ = [
    "decode_payloads_bitserial",
    "decode_payloads_batched",
    "parse_payload_tables",
]

LANES = 1024  # blocks per kernel invocation, laid out [8, 128]
CHUNK_WORDS = 16  # stream words per grid step -> 512 bit-steps


def parse_payload_tables(payload: bytes):
    """Host-side header parse -> decision tables + shifted symbol bits.

    Returns (fc[33] i32, adj[33] i32, sym4[64] i32, words u32[...],
    total_bits). fc[l] is the smallest l-bit codeword value that
    completes; adj[l] = psl[l] - fc[l] so rank = acc + adj[l]; sym4 packs
    the rank->symbol map 4 bytes per word (little-endian within the word).
    """
    from ..coders.huffman import read_table

    r = BitReader(payload)
    INF = np.int32(2**31 - 1)
    fc = np.full(33, INF, np.int32)
    adj = np.zeros(33, np.int32)
    syms = np.arange(256, dtype=np.int64)
    if r.read_bit():
        t = read_table(r)
        psl = np.zeros(t.longest, dtype=np.int64)
        psl[t.ordered_codelengths[0] - 1] = 0
        for i in range(1, t.alphabet_size):
            if t.ordered_codelengths[i - 1] < t.ordered_codelengths[i]:
                psl[t.ordered_codelengths[i] - 1] = i
        for l in range(1, int(t.longest) + 1):
            fc[l] = np.int32(t.firstcodes[l - 1])
            adj[l] = np.int32(psl[l - 1] - int(t.firstcodes[l - 1]))
        syms = np.zeros(256, np.int64)
        syms[: t.alphabet_size] = t.ordered_map_from_effective
    else:
        # degenerate: raw 8-bit literals == canonical len-8 identity code
        fc[8] = 0
        adj[8] = 0
    sym4 = (
        syms.reshape(64, 4) << (np.arange(4, dtype=np.int64) * 8)[None, :]
    ).sum(axis=1).astype(np.int32)

    hdr_bits = r.pos
    total_bits = max(0, r._valid - hdr_bits)
    # shift the symbol region down to bit 0 and view as MSB-first u32 words
    data = np.frombuffer(payload, np.uint8)
    byte0, sh = hdr_bits >> 3, hdr_bits & 7
    a = data[byte0:].astype(np.uint16)
    if sh:
        nxt = np.concatenate([a[1:], np.zeros(1, np.uint16)])
        a = ((a << sh) | (nxt >> (8 - sh))) & 0xFF
    a = a.astype(np.uint8)
    pad = (-len(a)) % 4
    if pad:
        a = np.concatenate([a, np.zeros(pad, np.uint8)])
    words = a.view(">u4").astype(np.uint32)
    return fc, adj, sym4, words, total_bits


def _bitserial_kernel(
    words_ref, tb_ref, fc_ref, adj_ref, sym4_ref, outv_ref, outn_ref,
    acc_ref, len_ref, *, chunk_words
):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
        len_ref[...] = jnp.zeros(len_ref.shape, jnp.int32)

    # static-index table rows (unrolled compare-select accumulation:
    # leading-dim reductions over [33/64, 8, 128] broadcasts lower
    # pathologically in Mosaic — measured 37 us/bit-step; static rows
    # keep everything in plain [8, 128] VPU ops)
    fc_rows = [fc_ref[l] for l in range(1, 33)]
    adj_rows = [adj_ref[l] for l in range(1, 33)]
    sym_rows = [sym4_ref[j] for j in range(64)]
    tb = tb_ref[0]  # [8,128] per-lane total symbol bits
    base = c * (chunk_words * 32)

    def body(w, carry):
        acc, ln = carry
        word = words_ref[w]  # [8,128] u32: bit column for all lanes
        for g in range(8):  # 8 output groups of 4 bit-steps per word
            v4 = jnp.zeros((8, 128), jnp.uint32)
            n4 = jnp.zeros((8, 128), jnp.int32)
            for k in range(4):
                bpos = g * 4 + k
                s = base + w * 32 + bpos
                bit = ((word >> jnp.uint32(31 - bpos)) & 1).astype(jnp.int32)
                live = s < tb
                acc = jnp.where(live, acc * 2 + bit, acc)
                ln = jnp.where(live, ln + 1, ln)
                fc = jnp.zeros((8, 128), jnp.int32)
                adj = jnp.zeros((8, 128), jnp.int32)
                for l in range(32):
                    hit = ln == (l + 1)
                    fc = jnp.where(hit, fc_rows[l], fc)
                    adj = jnp.where(hit, adj_rows[l], adj)
                comp = live & (acc >= fc)
                rank = jnp.clip(acc + adj, 0, 255)
                r4 = rank >> 2
                s4 = jnp.zeros((8, 128), jnp.int32)
                for j in range(64):
                    s4 = jnp.where(r4 == j, sym_rows[j], s4)
                sym = (
                    s4.astype(jnp.uint32) >> ((rank & 3) * 8).astype(jnp.uint32)
                ) & jnp.uint32(0xFF)
                v4 = jnp.where(comp, (v4 << jnp.uint32(8)) | sym, v4)
                n4 = jnp.where(comp, n4 + 8, n4)
                reset = comp | ~live
                acc = jnp.where(reset, 0, acc)
                ln = jnp.where(reset, 0, ln)
            outv_ref[w * 8 + g] = v4
            outn_ref[w * 8 + g] = n4
        return acc, ln

    acc, ln = jax.lax.fori_loop(
        0, chunk_words, body, (acc_ref[...], len_ref[...])
    )
    acc_ref[...] = acc
    len_ref[...] = ln


@partial(jax.jit, static_argnums=(2, 3))
def _bitserial_pass(words, total_bits, n_chunks: int, interpret: bool = False):
    """words [W, 8, 128] u32, total_bits [1, 8, 128] i32 ->
    (v [S4, 8, 128] u32, nb [S4, 8, 128] i32) with S4 = n_chunks*128
    4-step output groups."""
    fc, adj, sym4, tb = total_bits  # packed by caller
    S4 = n_chunks * CHUNK_WORDS * 8
    return pl.pallas_call(
        partial(_bitserial_kernel, chunk_words=CHUNK_WORDS),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK_WORDS, 8, 128), lambda c: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 8, 128), lambda c: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((33, 8, 128), lambda c: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((33, 8, 128), lambda c: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 8, 128), lambda c: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (CHUNK_WORDS * 8, 8, 128), lambda c: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (CHUNK_WORDS * 8, 8, 128), lambda c: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S4, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((S4, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(words, tb, fc, adj, sym4)


def decode_payloads_bitserial(
    payloads: list, max_out: int, interpret: bool = None
) -> list:
    """Decode up to LANES encode(huff) payloads in one lockstep batch.

    Returns the decoded bytes per payload (each <= max_out)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nb_real = len(payloads)
    assert nb_real <= LANES, "split the container into <=1024-block batches"
    parsed = [parse_payload_tables(p) for p in payloads]

    W = max((len(t[3]) for t in parsed), default=1)
    W = -(-max(W, 1) // CHUNK_WORDS) * CHUNK_WORDS
    words = np.zeros((LANES, W), np.uint32)
    fc = np.zeros((LANES, 33), np.int32)
    adj = np.zeros((LANES, 33), np.int32)
    sym4 = np.zeros((LANES, 64), np.int32)
    tb = np.zeros(LANES, np.int32)
    for i, (f, a, s4, w, t) in enumerate(parsed):
        words[i, : len(w)] = w
        fc[i] = f
        adj[i] = a
        sym4[i] = s4
        tb[i] = t
    n_chunks = W // CHUNK_WORDS

    # lane layout: block i at [:, i // 128, i % 128]
    d_words = jnp.asarray(words.T.reshape(W, 8, 128))
    tables = (
        jnp.asarray(fc.T.reshape(33, 8, 128)),
        jnp.asarray(adj.T.reshape(33, 8, 128)),
        jnp.asarray(sym4.T.reshape(64, 8, 128)),
        jnp.asarray(tb.reshape(1, 8, 128)),
    )
    v, nb = _bitserial_pass(d_words, tables, n_chunks, interpret)

    # second pass: compact the (value, nbits) groups into the byte arena
    from .bitpack_pallas import pack_blocks_pallas

    S4 = v.shape[0]
    vt = v.reshape(S4, LANES).T.astype(jnp.uint32)  # [LANES, S4]
    nt = nb.reshape(S4, LANES).T
    n_words_out = -(-max_out // 4)
    arena, bits = pack_blocks_pallas(vt, nt, n_words_out, interpret)
    arena = np.asarray(arena)
    bits = np.asarray(bits)
    out = []
    for i in range(nb_real):
        out.append(words_to_bytes(arena[i], int(bits[i])))
    return out


def decode_payloads_batched(payloads: list, max_out: int) -> list:
    """Decode any number of payloads, chunked into LANES-sized lockstep
    batches (the single entry point for both the blockwise compressor and
    the parallel runtime)."""
    out = []
    for lo in range(0, len(payloads), LANES):
        out.extend(
            decode_payloads_bitserial(payloads[lo : lo + LANES], max_out)
        )
    return out
