"""Suffix array construction: prefix doubling, host (numpy) and device (JAX).

Replaces the reference's vendored divsufsort (util/divsufsort.hpp:46-286,
ds/SADivSufSort.hpp:13-64) with the sort-based prefix-doubling formulation —
the parallel "sequence-parallel workhorse" of SURVEY.md §7 step 5. Same
output contract: SA[i] = start of the i-th lexicographically smallest
suffix, over the escaped text with its unique 0 sentinel appended.

The device version uses jax.lax.sort two-key sorts inside a while_loop with
early exit once all ranks are distinct; shapes stay static. The host
version is the numpy twin (np.lexsort); a faster native SA-IS lives in the
C++ runtime (native/tdc_native.cpp) and is preferred by TextDS when built.
"""

from __future__ import annotations

import numpy as np


def suffix_array_numpy(text: np.ndarray) -> np.ndarray:
    """Prefix-doubling SA on host. O(n log^2 n)."""
    text = np.asarray(text, dtype=np.uint8)
    n = len(text)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    rank = text.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r_ord = rank[order]
        k2_ord = key2[order]
        new_group = np.ones(n, dtype=np.int64)
        new_group[0] = 0
        new_group[1:] = (r_ord[1:] != r_ord[:-1]) | (k2_ord[1:] != k2_ord[:-1])
        ranks_sorted = np.cumsum(new_group)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = ranks_sorted
        if ranks_sorted[-1] == n - 1:
            return order.astype(np.int32)
        k *= 2


def suffix_array_jax(text, n_iters: int = None):
    """Prefix-doubling SA on device. [n] u8 -> [n] i32.

    n_iters defaults to ceil(log2 n); the loop early-exits (while_loop)
    once ranks are distinct.
    """
    import jax
    import jax.numpy as jnp

    n = text.shape[0]
    if n == 0:
        return jnp.zeros(0, jnp.int32)
    max_iters = n_iters or max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=jnp.int32)

    def round_body(state):
        rank, k, _done = state
        key2 = jnp.where(idx + k < n, jnp.roll(rank, -k), -1)
        r_ord, k2_ord, order = jax.lax.sort((rank, key2, idx), num_keys=2)
        new_group = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                (
                    (r_ord[1:] != r_ord[:-1]) | (k2_ord[1:] != k2_ord[:-1])
                ).astype(jnp.int32),
            ]
        )
        ranks_sorted = jnp.cumsum(new_group)
        rank = jnp.zeros(n, jnp.int32).at[order].set(ranks_sorted)
        done = ranks_sorted[-1] == n - 1
        return rank, k * 2, done

    def cond(state):
        _, k, done = state
        return (~done) & (k < 2 * n)

    rank0 = text.astype(jnp.int32)
    rank, _, _ = jax.lax.while_loop(cond, round_body, (rank0, jnp.int32(1), False))
    # final SA = argsort of ranks (ranks distinct, or text degenerate with
    # all-equal suffix prefixes resolved by the loop cap)
    _, sa = jax.lax.sort((rank, idx), num_keys=1)
    return sa


def inverse_permutation(sa: np.ndarray) -> np.ndarray:
    """ISA[sa[i]] = i (ds/ISAFromSA.hpp:12-61)."""
    isa = np.empty(len(sa), dtype=np.int32)
    isa[sa] = np.arange(len(sa), dtype=np.int32)
    return isa


def phi_from_sa(sa: np.ndarray) -> np.ndarray:
    """phi[sa[i]] = sa[i-1]; phi[sa[0]] = sa[n-1] (ds/PhiFromSA.hpp:37-45)."""
    n = len(sa)
    phi = np.empty(n, dtype=np.int32)
    if n == 0:
        return phi
    phi[sa[1:]] = sa[:-1]
    phi[sa[0]] = sa[n - 1]
    return phi


def plcp_from_phi_numpy(text: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """Kärkkäinen phi-algorithm (ds/PLCPFromPhi.hpp:38-44), vectorized.

    Chunked compare-and-extend with a max-plus scan propagating the
    plcp[i] >= plcp[i-1]-1 bound between rounds; total compare work stays
    O(n) amortized like the sequential original.
    """
    text = np.asarray(text, dtype=np.uint8)
    n = len(text)
    plcp = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return plcp.astype(np.int32)
    idx = np.arange(n, dtype=np.int64)
    l = np.zeros(n, dtype=np.int64)
    # positions to solve: 0..n-2 (reference loop bound i < n-1)
    active = np.ones(n, dtype=bool)
    active[n - 1] = False
    phi = phi.astype(np.int64)
    chunk = 64
    while active.any():
        # propagate lower bounds: l[i] >= max_j<=i (l[j] + j) - i
        l = np.maximum(l, np.maximum.accumulate(l + idx) - idx)
        ai = np.flatnonzero(active)
        # compare a chunk of characters at i+l vs phi[i]+l
        for _ in range(1):
            a = ai[:, None]
            off = l[ai][:, None] + np.arange(chunk)[None, :]
            p1 = a + off
            p2 = phi[ai][:, None] + off
            ok = (p1 < n) & (p2 < n)
            c1 = text[np.minimum(p1, n - 1)]
            c2 = text[np.minimum(p2, n - 1)]
            eq = ok & (c1 == c2)
            # first mismatch within the chunk (chunk if none)
            adv = np.argmin(eq, axis=1)
            full = eq.all(axis=1)
            adv[full] = chunk
            l[ai] += adv
            still = full
        active[ai] = still
        chunk = min(chunk * 2, 1 << 20)
    plcp[: n - 1] = l[: n - 1]
    return plcp.astype(np.int32)


def lcp_from_plcp(plcp: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP[i] = PLCP[sa[i]], LCP[0] = 0 (ds/LCPFromPLCP.hpp:38-49)."""
    lcp = plcp[sa].astype(np.int32)
    if len(lcp):
        lcp[0] = 0
    return lcp


def naive_suffix_array(text: bytes) -> np.ndarray:
    """O(n^2 log n) reference for tests."""
    n = len(text)
    return np.array(
        sorted(range(n), key=lambda i: text[i:]), dtype=np.int32
    )


def naive_lcp(text: bytes, sa: np.ndarray) -> np.ndarray:
    out = np.zeros(len(sa), dtype=np.int32)
    for i in range(1, len(sa)):
        a, b = text[sa[i - 1] :], text[sa[i] :]
        l = 0
        while l < len(a) and l < len(b) and a[l] == b[l]:
            l += 1
        out[i] = l
    return out
