"""Device (JAX) streaming transforms: MTF and RLE.

The BASELINE config-1 path (rle + mtf + coder) as jittable array programs:

- MTF encode: the closed-form rank (ops/mtf.py docstring): rank(i) =
  #{symbols whose last occurrence before i is later than c's}, with unseen
  symbols ranked by identity order. last-occurrence tables come from a
  cumulative max over one-hot position matrices — O(n * 256 / chunk) VPU
  work with a carried [256] state between chunks (lax.scan).
- RLE encode: run boundaries by shift-compare + segment ids by cumsum;
  emits (char, run_length) pairs for the host vbyte serializer. Decode is
  host/native (inherently sequential cursor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SIGMA = 256


def mtf_encode_device(data: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """[n] u8 -> [n] u8 MTF ranks; n must be a multiple of `chunk`."""
    n = data.shape[0]
    assert n % chunk == 0, "pad to a chunk multiple"
    blocks = data.reshape(n // chunk, chunk).astype(jnp.int32)

    def step(carry, block):
        # carry: [256] last occurrence so far (-1 = unseen), global positions
        base = carry  # [256]
        rows = jnp.arange(chunk, dtype=jnp.int32)
        onehot = block[:, None] == jnp.arange(SIGMA, dtype=jnp.int32)[None, :]
        occ = jnp.where(onehot, rows[:, None], -1)
        occ = jax.lax.cummax(occ, axis=0)  # last occ within block (or -1)
        # L[i, s]: last occurrence of s strictly before row i
        prev_in_block = jnp.concatenate(
            [jnp.full((1, SIGMA), -1, jnp.int32), occ[:-1]], axis=0
        )
        # positions are block-local; lift to comparable space with carry
        L = jnp.where(prev_in_block >= 0, prev_in_block + (1 << 24), base[None, :])
        cur = L[rows, block]
        seen = cur >= 0
        rank_seen = jnp.sum((L > cur[:, None]).astype(jnp.int32), axis=1)
        seen_mask = L >= 0
        nseen = jnp.sum(seen_mask.astype(jnp.int32), axis=1)
        seen_less = jnp.cumsum(seen_mask.astype(jnp.int32), axis=1) - seen_mask
        rank_unseen = nseen + block - seen_less[rows, block]
        out = jnp.where(seen, rank_seen, rank_unseen).astype(jnp.uint8)
        # new carry: last occurrence ordering after this block. Only the
        # ORDER of the carry matters; keep ranks by recency as values
        last_occ = occ[-1]
        final = jnp.where(last_occ >= 0, last_occ + (1 << 24), base)
        # re-normalize to avoid unbounded growth: rank-compress
        order = jnp.argsort(final)  # ascending; -1s first
        new_base = jnp.zeros(SIGMA, jnp.int32).at[order].set(
            jnp.arange(SIGMA, dtype=jnp.int32)
        )
        new_base = jnp.where(final < 0, -1, new_base)
        return new_base, out

    init = jnp.full((SIGMA,), -1, jnp.int32)
    _, outs = jax.lax.scan(step, init, blocks)
    return outs.reshape(n)


def rle_runs_device(data: jnp.ndarray):
    """[n] u8 -> (chars [n] u8, run_lengths [n] i32, n_runs i32).

    Runs are compacted to the front via a cumulative segment index; entries
    beyond n_runs are zero-padded. Matches the run decomposition of
    rle_encode (RunLengthEncoder.hpp:16-32); serialization to the vbyte
    stream stays on the host.
    """
    n = data.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.int32)
        return data, z, jnp.int32(0)
    new_run = jnp.concatenate(
        [jnp.ones(1, dtype=jnp.bool_), data[1:] != data[:-1]]
    )
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # run id per position
    n_runs = seg[-1] + 1
    lengths = jnp.zeros(n, jnp.int32).at[seg].add(1)
    chars = jnp.zeros(n, data.dtype).at[seg].max(data)
    return chars, lengths, n_runs
