"""Device-side lcpcomp: PLCP-peaks factorization + chain-resolving decode.

Compress (SURVEY.md §7 step 7): the priority-queue strategies (arrays/
heap/max_lcp — ArraysComp.hpp:36-119 etc.) mutate the LCP array after every
selection and are inherently sequential, but the `plcppeaks` strategy
(lcpcomp/compress/PLCPPeaksStrategy.hpp:33-80) is a greedy left-to-right
walk i += plcp[i] over statically-known peak conditions — exactly the
orbit-doubling shape already used for the device lzss_lcp parse
(ops/lzss_jax.greedy_visited). Factors are bit-identical to the host
strategy.

Decompress: every registered decoder (scan/compact/queue/multimap,
lcpcomp/decompress/*) produces the same bytes — the axis is a time/space
trade for pointer machines. The device formulation resolves all reference
chains at once: each text position's source chain (p -> src + (p - tgt)
through factor after factor until a literal) is collapsed by pointer
doubling — ceil(log2 n) + 1 rounds of one [n] gather — then a single
gather pulls every literal into place.
"""

from __future__ import annotations

import numpy as np

from .lzss_jax import greedy_visited


def plcppeaks_candidates(plcp, threshold):
    """Peak test + walk step per position (PLCPPeaksStrategy.hpp:33-80).

    C(0) = plcp[0] > plcp[1] (the i == last_replacement_pos clause, live
    only at i = 0); C(i>0) = plcp[i] > plcp[i-1] and plcp[i] > plcp[i+1];
    both require plcp[i] >= threshold and i + 1 < n.
    """
    import jax.numpy as jnp

    n = plcp.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    prv = jnp.concatenate([jnp.zeros(1, jnp.int32), plcp[:-1]])
    nxt = jnp.concatenate([plcp[1:], jnp.zeros(1, jnp.int32)])
    rising = jnp.where(idx == 0, True, plcp > prv)
    cond = rising & (plcp > nxt) & (plcp >= threshold) & (idx + 1 < n)
    step = jnp.where(cond, jnp.maximum(plcp, 1), 1)
    return cond, step


def plcppeaks_factorize_device(sa, isa, plcp, threshold):
    """Bit-identical device twin of tdc_lcpcomp_plcppeaks_factorize.

    Returns host arrays (pos, src, len), already in position order (the
    walk emits left to right).
    """
    import jax
    import jax.numpy as jnp

    n = int(sa.shape[0])
    if n == 0:
        e = np.zeros(0, np.int64)
        return e, e, e

    @jax.jit
    def run(sa, isa, plcp):
        cond, step = plcppeaks_candidates(plcp, threshold)
        visited = greedy_visited(step)
        sel = visited & cond
        src = sa[jnp.maximum(isa - 1, 0)]
        return sel, src, plcp

    sel, src, flen = run(
        jnp.asarray(sa, jnp.int32),
        jnp.asarray(isa, jnp.int32),
        jnp.asarray(plcp, jnp.int32),
    )
    pos = np.flatnonzero(np.asarray(sel))
    return (
        pos.astype(np.int64),
        np.asarray(src)[pos].astype(np.int64),
        np.asarray(flen)[pos].astype(np.int64),
    )


def resolve_factors_device(buffer: np.ndarray, tgt, src, lens) -> np.ndarray:
    """Fill factor-covered gaps by collapsing source chains on device.

    buffer: [n] u8 with literals placed, 0 = to be produced by a factor.
    Factor target ranges are disjoint (lcpcomp replaces disjoint text
    ranges); chains may run forward or backward and must terminate at
    literals (guaranteed for well-formed streams; ScanDec.hpp's
    undecodable check is mirrored by the caller asserting no zeros
    remain). Returns the filled buffer.
    """
    import jax
    import jax.numpy as jnp

    n = len(buffer)
    if n == 0 or len(tgt) == 0:
        return buffer
    # per-position source map (host: cheap vectorized repeat/arange)
    lens = np.asarray(lens, np.int64)
    tgt = np.asarray(tgt, np.int64)
    src = np.asarray(src, np.int64)
    total = int(lens.sum())
    starts = np.repeat(tgt, lens)
    sstart = np.repeat(src, lens)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    srcmap = np.arange(n, dtype=np.int32)
    srcmap[starts + intra] = (sstart + intra).astype(np.int32)

    rounds = max(1, (n - 1).bit_length()) + 1

    @jax.jit
    def run(buf, m):
        def body(_, m):
            return m[m]

        m = jax.lax.fori_loop(0, rounds, body, m)
        return buf[m], m

    out, m = run(jnp.asarray(buffer), jnp.asarray(srcmap))
    return np.asarray(out)
