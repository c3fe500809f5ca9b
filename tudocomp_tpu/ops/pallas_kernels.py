"""Pallas TPU kernels for the sequential inner loops of the encode path.

The Moffat/Katajainen Huffman passes are inherently sequential (509 tiny
steps over a 256-slot array). In plain XLA each step's dynamic read/write
becomes a gather/scatter (~100us apiece on TPU) or a 256-wide one-hot
select chain that compiles very slowly; in a Pallas kernel they are direct
VMEM accesses. One grid program per block; arrays are laid out [256, 1] so
dynamic indexing rides the sublane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (TPU backend)


def _moffat_lockstep_kernel(sigma_ref, keys_ref, a_ref):
    """Phases 1+2 of Moffat in-place code length calculation, all B blocks
    advancing in lockstep (one program; blocks ride the sublane dim, the
    256 array slots the lane dim). Dynamic per-block indices become
    one-hot lane masks — pure VPU selects, no serialization over blocks.
    """
    B = keys_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    m = sigma_ref[...]  # [B, 1]

    def rd(A, idx):
        return jnp.sum(
            jnp.where(lanes == idx, A, 0), axis=1, keepdims=True
        )

    def wr(A, idx, val, mask):
        return jnp.where((lanes == idx) & mask, val, A)

    A0 = keys_ref[...]
    A = wr(A0, 0, rd(A0, 0) + rd(A0, 1), m >= 2)

    def p1_body(t, carry):
        A, root, leaf = carry
        active = t < m - 1

        a_root = rd(A, root)
        a_leaf = rd(A, leaf)
        use1 = (leaf >= m) | (a_root < a_leaf)
        v1 = jnp.where(use1, a_root, a_leaf)
        A = wr(A, root, t, active & use1)
        root1 = jnp.where(use1, root + 1, root)
        leaf1 = jnp.where(use1, leaf, leaf + 1)
        A = wr(A, t, v1, active)

        a_root2 = rd(A, root1)
        a_leaf2 = rd(A, leaf1)
        use2 = (leaf1 >= m) | ((root1 < t) & (a_root2 < a_leaf2))
        v2 = jnp.where(use2, a_root2, a_leaf2)
        A = wr(A, root1, t, active & use2)
        root2 = jnp.where(use2, root1 + 1, root1)
        leaf2 = jnp.where(use2, leaf1, leaf1 + 1)
        A = wr(A, t, v1 + v2, active)

        root = jnp.where(active, root2, root)
        leaf = jnp.where(active, leaf2, leaf)
        return A, root, leaf

    A, _, _ = jax.lax.fori_loop(
        1,
        255,
        p1_body,
        (A, jnp.zeros((B, 1), jnp.int32), jnp.full((B, 1), 2, jnp.int32)),
    )

    A = wr(A, jnp.maximum(m - 2, 0), 0, m >= 2)

    def p2_body(j, A):
        nxt = m - 3 - j
        active = nxt >= 0
        nxt_c = jnp.maximum(nxt, 0)
        parent = rd(A, rd(A, nxt_c))
        return wr(A, nxt_c, parent + 1, active)

    A = jax.lax.fori_loop(0, 254, p2_body, A)
    a_ref[...] = A


def _rank_roll(key, B, steps=256):
    """rank[b, s] = #{j != s : key[b, j] < key[b, s]} via lane rotations.

    Every unordered pair meets at exactly one rotation distance, so 255
    roll+compare+add steps produce exact ranks with no [256, 256]
    comparison matrix and no sort — pure VPU, all blocks in lockstep.
    """
    rank = jnp.zeros(key.shape, jnp.int32)
    for k in range(1, steps):
        rank = rank + (pltpu.roll(key, k, axis=1) < key).astype(jnp.int32)
    return rank


def _huffman_tables_kernel(hist_ref, len_ref, cw_ref, numl_ref, osym_ref, meta_ref):
    """One-pass per-block Huffman table construction, B blocks in lockstep:

      histogram -> (rank sort) -> Moffat/Katajainen phases 1+2 ->
      leaf depths (phase 3) -> canonical codewords + table metadata

    Replaces the XLA _sort_hist + moffat_phase12 + _phase3 +
    canonical_codes_batch chain, whose [B, 256, 256] comparison matrices
    cost ~30 ms per 64 blocks on v5e where this kernel is sub-ms. Exact
    tie-breaking parity: sort key (count << 9) | symbol, canonical order
    (length, symbol) — HuffmanCoder.hpp:88-218 semantics.
    """
    B = hist_ref.shape[0]
    MAX_LEN = 32
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    BIG = jnp.int32(0x3FFFFFFF)

    hist = hist_ref[...]
    present = hist > 0
    sigma = jnp.sum(present.astype(jnp.int32), axis=1, keepdims=True)  # [B,1]
    m = sigma

    # sort by (count, symbol); absent last --------------------------------
    key = jnp.where(present, (hist << 9) | lanes, BIG | lanes)
    rank = _rank_roll(key, B)  # [B, 256] sorted position per symbol
    kv = jnp.where(present, hist, BIG)
    # sorted_* [b, p] = value of the symbol with rank p (roll-based invert)
    sorted_key = jnp.zeros((B, 256), jnp.int32)
    for k in range(256):
        rk = pltpu.roll(rank, k, axis=1) if k else rank
        vk = pltpu.roll(kv, k, axis=1) if k else kv
        sorted_key = jnp.where(rk == lanes, vk, sorted_key)

    def rd(A, idx):
        return jnp.sum(jnp.where(lanes == idx, A, 0), axis=1, keepdims=True)

    def wr(A, idx, val, mask):
        return jnp.where((lanes == idx) & mask, val, A)

    # Moffat phases 1+2 (in-place minimum redundancy) ---------------------
    A = wr(sorted_key, 0, rd(sorted_key, 0) + rd(sorted_key, 1), m >= 2)

    def p1_body(t, carry):
        A, root, leaf = carry
        active = t < m - 1

        a_root = rd(A, root)
        a_leaf = rd(A, leaf)
        use1 = (leaf >= m) | (a_root < a_leaf)
        v1 = jnp.where(use1, a_root, a_leaf)
        A = wr(A, root, t, active & use1)
        root1 = jnp.where(use1, root + 1, root)
        leaf1 = jnp.where(use1, leaf, leaf + 1)
        A = wr(A, t, v1, active)

        a_root2 = rd(A, root1)
        a_leaf2 = rd(A, leaf1)
        use2 = (leaf1 >= m) | ((root1 < t) & (a_root2 < a_leaf2))
        v2 = jnp.where(use2, a_root2, a_leaf2)
        A = wr(A, root1, t, active & use2)
        root2 = jnp.where(use2, root1 + 1, root1)
        leaf2 = jnp.where(use2, leaf1, leaf1 + 1)
        A = wr(A, t, v1 + v2, active)

        root = jnp.where(active, root2, root)
        leaf = jnp.where(active, leaf2, leaf)
        return A, root, leaf

    A, _, _ = jax.lax.fori_loop(
        1,
        255,
        p1_body,
        (A, jnp.zeros((B, 1), jnp.int32), jnp.full((B, 1), 2, jnp.int32)),
    )
    A = wr(A, jnp.maximum(m - 2, 0), 0, m >= 2)

    def p2_body(j, A):
        nxt = m - 3 - j
        active = nxt >= 0
        nxt_c = jnp.maximum(nxt, 0)
        parent = rd(A, rd(A, nxt_c))
        return wr(A, nxt_c, parent + 1, active)

    A = jax.lax.fori_loop(0, 254, p2_body, A)

    # phase 3: internal depths -> per-symbol code lengths ----------------
    internal = lanes < m - 1
    idepth = jnp.where(internal, jnp.minimum(A, MAX_LEN + 1), MAX_LEN + 1)
    # leaves per depth d: 2*internal(d-1) - internal(d); cum prefix sums.
    # loop over the 33 depth slots, [B,1] scalars per block
    cum = jnp.zeros((B, 256), jnp.int32)  # cum[b, d] valid for d <= MAX_LEN
    nd_prev = jnp.zeros((B, 1), jnp.int32)
    run = jnp.zeros((B, 1), jnp.int32)
    for d in range(MAX_LEN + 1):
        nd = jnp.sum((idepth == d).astype(jnp.int32), axis=1, keepdims=True)
        if d > 0:
            run = run + 2 * nd_prev - nd
        cum = jnp.where(lanes == d, run, cum)
        nd_prev = nd
    # depth of sorted position p (ascending freq): #{d : cum[d] <= m-1-p}
    rankf = m - 1 - lanes  # rank from most frequent, per position p=lane
    depth_pos = jnp.zeros((B, 256), jnp.int32)
    for d in range(MAX_LEN + 1):
        cd = rd(cum, d)
        depth_pos = depth_pos + (cd <= rankf).astype(jnp.int32)
    depth_pos = jnp.where(lanes < m, depth_pos, 0)
    # per-symbol lengths: lengths[s] = depth_pos[rank[s]] (roll-gather:
    # dk[s] = depth_pos[(s + k) & 255], taken where rank[s] == s + k)
    lengths = jnp.zeros((B, 256), jnp.int32)
    for k in range(256):
        dk = pltpu.roll(depth_pos, 256 - k, axis=1) if k else depth_pos
        lengths = jnp.where(rank == ((lanes + k) & 255), dk, lengths)
    lengths = jnp.where(m >= 2, lengths, 0)
    len_ref[...] = lengths

    # canonical codes (HuffmanCoder.hpp:192-218) -------------------------
    # sigma/longest re-derived from the (masked) lengths so degenerate
    # blocks report 0/0, matching canonical_codes_batch semantics
    sigma_c = jnp.sum((lengths > 0).astype(jnp.int32), axis=1, keepdims=True)
    longest = jnp.max(lengths, axis=1, keepdims=True)
    # numl[l-1] = #symbols with length l, l = 1..MAX_LEN, in lanes 0..31
    numl = jnp.zeros((B, 256), jnp.int32)
    for l in range(1, MAX_LEN + 1):
        nl = jnp.sum((lengths == l).astype(jnp.int32), axis=1, keepdims=True)
        numl = jnp.where(lanes == l - 1, nl, numl)
    numl_ref[...] = numl
    # firstcode[l-1] descending scan
    firstcode = jnp.zeros((B, 256), jnp.int32)
    fc = jnp.zeros((B, 1), jnp.int32)
    for i in range(MAX_LEN - 1, 0, -1):
        fc = jnp.where(i < longest, (fc + rd(numl, i)) >> 1, 0)
        firstcode = jnp.where(lanes == i - 1, fc, firstcode)

    # order by (length, symbol); absent last ------------------------------
    key2 = jnp.where(present & (lengths > 0), (lengths << 9) | lanes, BIG | lanes)
    rank2 = _rank_roll(key2, B)
    # ordered_sym[p] / ordered_len[p] via roll-invert
    ordered_sym = jnp.zeros((B, 256), jnp.int32)
    ordered_len = jnp.zeros((B, 256), jnp.int32)
    lb = jnp.where(lengths > 0, lengths, BIG)
    for k in range(256):
        rk = pltpu.roll(rank2, k, axis=1) if k else rank2
        lk = pltpu.roll(lb, k, axis=1) if k else lb
        hit = rk == lanes
        # symbol index that rolled here is (lane - k) mod 256
        ordered_sym = jnp.where(hit, (lanes - k) & 255, ordered_sym)
        ordered_len = jnp.where(hit, lk, ordered_len)
    # first position of each length group + firstcode per position
    num_shorter = jnp.zeros((B, 256), jnp.int32)
    acc = jnp.zeros((B, 1), jnp.int32)
    for l in range(1, MAX_LEN + 1):
        num_shorter = jnp.where(lanes == l - 1, acc, num_shorter)
        acc = acc + rd(numl, l - 1)
    first_of_len = jnp.zeros((B, 256), jnp.int32)
    fc_of_len = jnp.zeros((B, 256), jnp.int32)
    for l in range(1, MAX_LEN + 1):
        sel = ordered_len == l
        first_of_len = jnp.where(sel, rd(num_shorter, l - 1), first_of_len)
        fc_of_len = jnp.where(sel, rd(firstcode, l - 1), fc_of_len)
    live = lanes < sigma_c
    ordered_cw = jnp.where(live, fc_of_len + (lanes - first_of_len), 0)
    ordered_sym = jnp.where(live, ordered_sym, 0)
    osym_ref[...] = ordered_sym
    # invert ordering back to per-symbol codewords: cw[s] = ordered_cw[rank2[s]]
    cw = jnp.zeros((B, 256), jnp.int32)
    for k in range(256):
        ck = pltpu.roll(ordered_cw, 256 - k, axis=1) if k else ordered_cw
        cw = jnp.where(rank2 == ((lanes + k) & 255), ck, cw)
    cw_ref[...] = cw
    meta_ref[...] = jnp.concatenate(
        [sigma_c, longest, jnp.zeros((B, 254), jnp.int32)], axis=1
    )


def huffman_tables_pallas(hists: jnp.ndarray, interpret=None):
    """[B, 256] histograms -> (lengths, cw, numl[B,32], ordered_sym,
    sigma [B], longest [B]) — the full per-block canonical Huffman table
    stage as one Pallas kernel, gridded in groups of 8 blocks (the
    working set for larger groups exceeds the 16 MiB scoped-VMEM limit)."""
    B = hists.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    GB = 8  # blocks per grid step
    Bp = -(-B // GB) * GB
    if Bp != B:
        hists = jnp.pad(hists, ((0, Bp - B), (0, 0)))
    spec = pl.BlockSpec((GB, 256), lambda g: (g, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _huffman_tables_kernel,
        grid=(Bp // GB,),
        in_specs=[spec],
        out_specs=tuple(
            pl.BlockSpec((GB, 256), lambda g: (g, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Bp, 256), jnp.int32) for _ in range(5)
        ),
        interpret=interpret,
    )(hists.astype(jnp.int32))
    lengths, cw, numl, osym, meta = (o[:B] for o in outs)
    return (
        lengths,
        cw.astype(jnp.uint32),
        numl[:, :32],
        osym,
        meta[:, 0],
        meta[:, 1],
    )


def moffat_phase12(sorted_keys: jnp.ndarray, sigmas: jnp.ndarray, interpret=None):
    """Batched Moffat phases 1+2: [B, 256] sorted weights + [B] sigma ->
    [B, 256] arrays whose slots 0..sigma-2 hold internal-node depths."""
    B = sorted_keys.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _moffat_lockstep_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 256), jnp.int32),
        interpret=interpret,
    )(sigmas.astype(jnp.int32).reshape(B, 1), sorted_keys.astype(jnp.int32))
    return out
