"""Device-side canonical Huffman decode: the parallel entropy *decode* path.

Entropy decode is sequential by nature (each codeword's start depends on the
previous lengths — SURVEY.md §7 "hard parts" #2). The TPU formulation here
breaks the chain with a *jump table + pointer doubling*:

  1. For EVERY bit position p of the packed arena, peek 32 bits and find the
     canonical code length l(p) = min{l : v_l >= firstcode[l]} — the exact
     first-match rule of the host decoder (coders/huffman.py:240-244,
     include/tudocomp/coders/HuffmanCoder.hpp decode loop). This is a
     32-iteration vectorized compare over all positions at once: no
     dependency between positions.
  2. sym(p) and next(p) = p + l(p) follow from the same peek — a [n_bits]
     jump table.
  3. The decode chain start -> next(start) -> ... is extracted with pointer
     doubling: after round j the first 2^j output slots hold the positions
     of symbols 0..2^j-1, and the jump function doubles (F <- F[F]). O(log n)
     depth, O(n log n) gathers — XLA-friendly, no while_loop over symbols.

Only positions actually reachable from the start participate in the final
answer, so garbage lengths computed at mid-codeword positions are harmless.

The per-block table header (flag bit + serialized table, a few hundred bits)
is parsed on host — it is O(sigma) and format-bound; the bulk symbol decode
(99.9% of the bits) runs on device. Works for code lengths <= 32, which the
encoder guarantees for blocks <= 2 MiB (ops/huffman_jax.py MAX_BLOCK).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_blocks", "decode_payloads_device"]

MAX_LEN = 32


def _u32(x):
    return x.astype(jnp.uint32)


def _peek32(words: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """[W] u32 arena -> [n_bits] u32: the 32 bits starting at each position.

    Bit p lives in word p>>5 at bit 31-(p&31) (MSB-first, ops/bitpack.py).
    """
    w = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])
    p = jnp.arange(n_bits, dtype=jnp.int32)
    wi = p >> 5
    sh = _u32(p & 31)
    hi = w[wi] << sh
    lo_shift = jnp.uint32(32) - sh
    lo = jnp.where(sh > 0, w[wi + 1] >> jnp.maximum(lo_shift, 1), jnp.uint32(0))
    return hi | lo


def _jump_table(peek, fc, psl, syms, longest):
    """Per-position (code length, symbol) via the canonical first-match rule.

    fc[l-1] is the smallest codeword of length l (u32, padded beyond
    longest); psl[l-1] the ordered-map index of the first length-l symbol.
    """
    n = peek.shape[0]
    best = jnp.zeros(n, jnp.int32)

    def body(l, best):
        v = peek >> _u32(32 - l)
        match = (v >= fc[l - 1]) & (l <= longest)
        return jnp.where((best == 0) & match, l, best)

    best = jax.lax.fori_loop(1, MAX_LEN + 1, body, best)
    best = jnp.maximum(best, 1)  # padded tail positions: anything
    v = peek >> _u32(32 - best)
    off = psl[best - 1] + (v - fc[best - 1]).astype(jnp.int32)
    sym = syms[jnp.clip(off, 0, syms.shape[0] - 1)]
    return best, sym


def _extract_chain(nxt, sym, start, end_bit, max_out: int):
    """Pointer-doubling chain walk: positions/symbols of the decode sequence.

    nxt/sym are [n_bits]; positions >= end_bit jump to a self-loop sink.
    Returns (out_sym [max_out] u8, count i32).
    """
    n_bits = nxt.shape[0]
    sink = jnp.int32(n_bits)
    pos_ids = jnp.arange(n_bits, dtype=jnp.int32)
    live = pos_ids < end_bit
    f = jnp.where(live, jnp.minimum(nxt, sink), sink)
    f = jnp.concatenate([f, jnp.full(1, sink, jnp.int32)])  # sink self-loop
    sym = jnp.concatenate([sym, jnp.zeros(1, sym.dtype)])

    idx = jnp.arange(max_out, dtype=jnp.int32)
    chain = jnp.where(idx == 0, jnp.minimum(start, sink), sink)
    step = 1
    while step < max_out:
        jumped = f[chain]  # position 2^j symbols later
        shifted = jnp.roll(jumped, step)
        chain = jnp.where(idx < step, chain, shifted)
        if 2 * step < max_out:
            f = f[f]
        step *= 2
    valid = chain < end_bit
    out = jnp.where(valid, sym[jnp.minimum(chain, sink)], 0)
    return out, jnp.sum(valid.astype(jnp.int32))


@partial(jax.jit, static_argnums=(7,))
def decode_blocks(words, start, end, fc, psl, syms, longest, max_out: int):
    """Bulk-decode a batch of canonical-Huffman blocks on device.

    Args:
      words:  [B, W] u32 packed arenas (payload bytes as big-endian words).
      start:  [B] i32 first payload bit (after the flag+table header).
      end:    [B] i32 one past the last valid bit (EOF convention).
      fc:     [B, 32] u32 firstcode per length (1-indexed by length-1).
      psl:    [B, 32] i32 ordered-map index of the first symbol per length.
      syms:   [B, 256] i32 ordered symbol map (padded with 0).
      longest:[B] i32 longest code length (<= 32).
      max_out: static per-block output capacity.

    Returns: (symbols [B, max_out] u8-as-i32, counts [B] i32).
    """
    n_bits = words.shape[1] * 32

    def one_block(w, s, e, f, p, sy, lg):
        peek = _peek32(w, n_bits)
        ln, sm = _jump_table(peek, f, p, sy, lg)
        pos = jnp.arange(n_bits, dtype=jnp.int32)
        return _extract_chain(pos + ln, sm, s, e, max_out)

    return jax.vmap(one_block)(words, start, end, fc, psl, syms, longest)


def _payload_words(payload: bytes, n_words: int) -> np.ndarray:
    buf = np.frombuffer(payload, np.uint8)
    padded = np.zeros(n_words * 4, np.uint8)
    padded[: len(buf)] = buf
    return padded.view(">u4").astype(np.uint32)


def decode_payloads_device(payloads: list[bytes], max_out: int) -> list[bytes]:
    """Decode a list of raw `encode(huff)` block payloads on device.

    Host parses each block's 1-bit flag + table header (O(sigma) bits);
    the device kernel decodes the symbol stream. Degenerate (flag=0)
    blocks are raw 8-bit literals and decode host-side directly.
    """
    from ..coders.huffman import read_table
    from ..io.bitio import BitReader

    B = len(payloads)
    out: list = [None] * B
    idxs, rows = [], []
    n_words = max((len(p) + 3) // 4 for p in payloads) + 1
    for i, p in enumerate(payloads):
        r = BitReader(p)
        if not r.read_bit():
            n = max(0, r._valid - r.pos) // 8
            out[i] = r.read_ints(n, 8).astype(np.uint8).tobytes()
            continue
        t = read_table(r)
        if t.longest > MAX_LEN:
            raise ValueError("device decode supports code lengths <= 32")
        fc = np.zeros(MAX_LEN, np.uint32)
        fc[: t.longest] = t.firstcodes.astype(np.uint32)
        psl = np.zeros(MAX_LEN, np.int32)
        psl[t.ordered_codelengths[0] - 1] = 0
        for j in range(1, t.alphabet_size):
            if t.ordered_codelengths[j - 1] < t.ordered_codelengths[j]:
                psl[t.ordered_codelengths[j] - 1] = j
        syms = np.zeros(256, np.int32)
        syms[: t.alphabet_size] = t.ordered_map_from_effective
        idxs.append(i)
        rows.append(
            (
                _payload_words(p, n_words),
                np.int32(r.pos),
                np.int32(r._valid),
                fc,
                psl,
                syms,
                np.int32(t.longest),
            )
        )
    if rows:
        stacked = [jnp.asarray(np.stack([r[k] for r in rows])) for k in range(7)]
        symbols, counts = decode_blocks(*stacked, max_out)
        symbols = np.asarray(symbols)
        counts = np.asarray(counts)
        for row, i in enumerate(idxs):
            out[i] = symbols[row, : counts[row]].astype(np.uint8).tobytes()
    return out
