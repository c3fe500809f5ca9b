"""Device-side lzss_lcp factorization: parallel ANSV + greedy parse.

The reference factorizer (compressors/LZSSLCPCompressor.hpp:60-115) walks
the text left to right and, per position, scans the suffix array for the
previous/next smaller value (PSV/NSV) while folding the minimum LCP along
the way — O(n^2) worst case. The host rebuild replaces the scans with O(n)
monotone stacks (native tdc_lzss_lcp_factorize). This module is the
TPU-parallel formulation (SURVEY.md §7 step 6):

  1. ANSV with min-LCP: pointer doubling over the "previous/next smaller"
     candidate chain — O(log n) rounds of two gathers, carrying the range
     minimum of LCP alongside the candidate pointer, so psv_lcp/nsv_lcp
     arrive with the positions (the stack algorithm's min bookkeeping,
     vectorized).
  2. Greedy left-to-right factor selection: the walk i += max(len_i, 1) is
     an orbit of a jump function f; the visited set is computed by orbit
     doubling (v |= v∘f^(2^k); f^(2^(k+1)) = f^(2^k)∘f^(2^k)), again
     O(log n) rounds of one gather + one scatter.

Outputs match tdc_lzss_lcp_factorize exactly (ties prefer PSV; factors
require len >= threshold; position n-1 never starts a factor).
"""

from __future__ import annotations

import numpy as np


def ansv_minlcp(sa, lcp):
    """PSV/NSV over the SA with folded min-LCP, by pointer doubling.

    Args: sa [n] i32, lcp [n] i32 (lcp[0] = 0).
    Returns (psv_src, psv_lcp, nsv_src, nsv_lcp), each [n] i32;
    src = sa[psv/nsv position] or -1 where none exists, lcp = min LCP over
    the skipped SA range (0 where none).
    """
    import jax
    import jax.numpy as jnp

    sa = jnp.asarray(sa, jnp.int32)
    lcp = jnp.asarray(lcp, jnp.int32)
    n = sa.shape[0]
    if n == 0:
        z = jnp.zeros(0, jnp.int32)
        return z, z, z, z
    idx = jnp.arange(n, dtype=jnp.int32)

    def doubling(p0, m0, found_fn):
        # pointer doubling halves chains through LIVE nodes; chains of
        # already-found nodes advance one hop per round, so the round
        # count is data-dependent: loop until every position resolves
        def live_of(p):
            return ~found_fn(p, jnp.clip(p, 0, n - 1))

        def cond(state):
            p, _m = state
            return jnp.any(live_of(p))

        def body(state):
            p, m = state
            pc = jnp.clip(p, 0, n - 1)
            live = live_of(p)
            p2 = p[pc]
            m2 = jnp.minimum(m, m[pc])
            p = jnp.where(live, p2, p)
            m = jnp.where(live, m2, m)
            return p, m

        return jax.lax.while_loop(cond, body, (p0, m0))

    # PSV: candidate left neighbour; m covers lcp over (p, j]
    def psv_found(p, pc):
        return (p < 0) | (sa[pc] < sa)

    p, m = doubling(idx - 1, lcp.astype(jnp.int32), psv_found)
    psv_ok = p >= 0
    psv_src = jnp.where(psv_ok, sa[jnp.clip(p, 0, n - 1)], -1)
    psv_lcp = jnp.where(psv_ok, m, 0)

    # NSV: candidate right neighbour; m covers lcp over (j, p]
    def nsv_found(p, pc):
        return (p >= n) | (sa[pc] < sa)

    m0 = jnp.where(idx + 1 < n, jnp.roll(lcp, -1), 0).astype(jnp.int32)
    p, m = doubling(idx + 1, m0, nsv_found)
    nsv_ok = p < n
    nsv_src = jnp.where(nsv_ok, sa[jnp.clip(p, 0, n - 1)], -1)
    nsv_lcp = jnp.where(nsv_ok, m, 0)
    return psv_src, psv_lcp, nsv_src, nsv_lcp


def greedy_visited(step):
    """Visited set of the walk i_{k+1} = i_k + step[i_k] from 0.

    step [n] i32 (>= 1). Returns visited [n] bool, by orbit doubling.
    """
    import jax
    import jax.numpy as jnp

    n = step.shape[0]
    if n == 0:
        return jnp.zeros(0, bool)
    rounds = max(1, (n - 1).bit_length()) + 1
    idx = jnp.arange(n, dtype=jnp.int32)
    f = jnp.clip(idx + jnp.maximum(step, 1), 0, n)  # n = sink

    def body(_, state):
        v, g = state
        # v' = v | image of v under g (scatter-or); g' = g o g
        img = jnp.zeros(n, jnp.int32).at[jnp.clip(g, 0, n - 1)].max(
            v.astype(jnp.int32) * (g < n)
        )
        v = v | (img > 0)
        gext = jnp.concatenate([g, jnp.array([n], jnp.int32)])  # gext[n] = n
        g = gext[g]
        return v, g

    v0 = idx == 0
    v, _ = jax.lax.fori_loop(0, rounds, body, (v0, f))
    return v


def lzss_lcp_candidates(sa, isa, lcp, threshold):
    """Per text position: greedy-walk step, factor length and source.

    Returns (step [n] i32, flen [n] i32, fsrc [n] i32) in TEXT order:
    flen[i] >= threshold means position i would emit factor (i, fsrc, flen)
    if visited; step[i] = flen[i] or 1. Position n-1 never factors.
    """
    import jax.numpy as jnp

    n = sa.shape[0]
    psv_src, psv_lcp, nsv_src, nsv_lcp = ansv_minlcp(sa, lcp)
    use_psv = psv_lcp >= nsv_lcp  # ties prefer PSV (reference)
    maxl = jnp.where(use_psv, psv_lcp, nsv_lcp)
    msrc = jnp.where(use_psv, psv_src, nsv_src)
    # to text order
    maxl_t = maxl[isa]
    msrc_t = msrc[isa]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_factor = (maxl_t >= threshold) & (idx + 1 < n)
    step = jnp.where(is_factor, maxl_t, 1)
    flen = jnp.where(is_factor, maxl_t, 0)
    return step, flen, msrc_t


def lzss_lcp_factorize_device(sa, isa, lcp, threshold):
    """Full device factorization; returns host arrays (pos, src, len).

    Mirrors tdc_lzss_lcp_factorize output exactly.
    """
    import jax
    import jax.numpy as jnp

    n = int(sa.shape[0])
    if n == 0:
        e = np.zeros(0, np.int64)
        return e, e, e

    @jax.jit
    def run(sa, isa, lcp):
        step, flen, fsrc = lzss_lcp_candidates(sa, isa, lcp, threshold)
        visited = greedy_visited(step)
        sel = visited & (flen > 0)
        return sel, flen, fsrc

    sel, flen, fsrc = run(
        jnp.asarray(sa, jnp.int32),
        jnp.asarray(isa, jnp.int32),
        jnp.asarray(lcp, jnp.int32),
    )
    sel = np.asarray(sel)
    pos = np.flatnonzero(sel)
    return (
        pos.astype(np.int64),
        np.asarray(fsrc)[pos].astype(np.int64),
        np.asarray(flen)[pos].astype(np.int64),
    )
