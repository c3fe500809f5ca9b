"""Vectorized ESP round (array formulation of tdc_esp_round).

This module re-expresses one ESP parsing round (EspContextImpl.hpp:14-165,
meta_blocks.hpp:16-188, GrammarRules.hpp:17-102 in the reference) as a
sequence of whole-array passes — the formulation the device (JAX) round in
``ops/esp_jax.py`` compiles. The numpy version here is the testable
specification: it must produce *bit-identical* (nxt, rules_l, rules_r) to
``compressors.esp.esp_round_python`` / native ``tdc_esp_round`` on every
input.

Decomposition (all O(n) elementwise/scan/sort passes):

1. **Segmentation** — positions belonging to an equal-adjacent run (length
   >= 2) form type-1 metablocks, split where the symbol changes; the gaps
   are type-2 metablocks (RoundContextImpl.hpp:17-55 scan semantics).
2. **Block starts** — every emitted block begins at a unique source
   position, so blocks are representable as (is_start, type) arrays:
   - runs use the eager_mb13 split (3,3,...,remainder as 3/2+2/2,2/1),
     which has a closed form in the within-run offset;
   - type-2 metablocks emit an eager_mb13(t3, 3) prefix
     (t3 = min(iter_log(alphabet), L)) followed by landmark blocks over
     the t3-times label-reduced buffer (meta_blocks.hpp:65-180): the
     alphabet reduction, the 3/4/5->mex replacement and the high/low
     landmark rules are elementwise; block starts are landmark positions
     shifted left by one (clipped), so lengths come from a global diff.
3. **Adjust** — ``_adjust_blocks``'s 3-slot queue is the identity wherever
   no length-1 block is in sight; length-1 blocks are rare and local
   (merges only ever touch an immediate neighbour), so the exact queue
   semantics only need replaying inside +-3-block windows around each
   length-1 block (overlapping windows merged).
4. **Naming** — GrammarRules assigns each distinct pair the running count
   at first appearance. Over the flat sequence of add2() calls (one per
   2-block, inner+outer for 3-blocks) the id of a key is the *rank of its
   first occurrence* among all distinct keys' first occurrences — a
   sort-based computation. Outer keys (alphabet + x, c) reference the
   inner id x only for identity, so (inner-group, c) is an equivalent
   canonical key and the two levels resolve in one pass.
"""

from __future__ import annotations

import numpy as np

__all__ = ["esp_round_vec", "iter_log"]


def iter_log(alphabet: int) -> int:
    """DebugContext iteration count (esp/EspContext.hpp semantics)."""
    if alphabet < 7:
        return 0
    if alphabet < 9:
        return 1
    if alphabet < 17:
        return 2
    if alphabet < 257:
        return 3
    return 4


def _label(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Elementwise label() — 2*ctz(l^r) + bit of r at that position."""
    diff = left ^ right
    lsb = diff & (-diff)
    # exact for lsb = 2^k, k < 52
    l = np.where(diff != 0, np.log2(np.maximum(lsb, 1)).astype(np.int64), 0)
    return 2 * l + ((right >> l) & 1)


def _mb13_starts(off: np.ndarray, r: np.ndarray):
    """eager_mb13 split in closed form.

    off = within-segment offset, r = segment length (per element).
    Returns (is_start, length) arrays; callers mask to their segments.
    """
    mod = r % 3
    m0 = (mod == 0) & (off % 3 == 0)
    m2 = (mod == 2) & (off % 3 == 0)
    m1 = (mod == 1) & (r > 1) & (
        ((off % 3 == 0) & (off < r - 4)) | (off == r - 4) | (off == r - 2)
    )
    single = r == 1
    is_start = m0 | m2 | m1 | (single & (off == 0))
    length = np.where(single, 1, np.where(off < r - 2, 3, 2)).astype(np.int64)
    # mod==0 blocks are always 3; the formula above already yields 3 there
    return is_start, length


def _type2_landmark_starts(src, seg_start_pos, seg_len, off, is_t2, t):
    """Landmark block starts for type-2 segments, in source offsets.

    Returns a bool array over positions: True where a landmark block
    begins (at source offset t3 + b for buf index b).
    """
    n = len(src)
    t3 = np.minimum(t, seg_len)  # per element
    B = seg_len - t3
    cur = src.astype(np.int64).copy()
    # alphabet reduction: k-th step writes buf[b] = label(buf[b], buf[b+1])
    # for b in [0, L-k-2]; only type-2 positions participate
    shifted = np.empty_like(cur)
    for k in range(int(t)):
        shifted[:-1] = cur[1:]
        shifted[-1] = cur[-1]
        mask = is_t2 & (off <= seg_len - k - 2)
        cur = np.where(mask, _label(cur, shifted), cur)
    # 3/4/5 -> mex replacement over the reduced buffer buf[0..B-1]
    valid = is_t2 & (off < B)
    for v in (3, 4, 5):
        left = np.empty_like(cur)
        left[1:] = cur[:-1]
        left[0] = -1
        right = np.empty_like(cur)
        right[:-1] = cur[1:]
        right[-1] = -1
        has_l = valid & (off > 0)
        has_r = valid & (off + 1 < B)
        lv = np.where(has_l, left, -1)
        rv = np.where(has_r, right, -1)
        # e = smallest of 0,1,2 not in {lv, rv}
        e = np.zeros(n, np.int64)
        for _ in range(2):
            e = np.where((lv == e) | (rv == e), e + 1, e)
            e = np.where((lv == e) | (rv == e), e + 1, e)
        cur = np.where(valid & (cur == v), e, cur)
    # landmarks
    left = np.empty_like(cur)
    left[1:] = cur[:-1]
    left[0] = -1
    right = np.empty_like(cur)
    right[:-1] = cur[1:]
    right[-1] = -1
    has_l = valid & (off > 0)
    has_r = valid & (off + 1 < B)
    high = valid & ~(has_l & (left > cur)) & ~(has_r & (right > cur))
    high_l = np.zeros(n, bool)
    high_l[1:] = high[:-1]
    high_r = np.zeros(n, bool)
    high_r[:-1] = high[1:]
    low = (
        valid
        & ~(has_l & (left < cur))
        & ~(has_r & (right < cur))
        & ~(has_l & high_l)
        & ~(has_r & high_r)
    )
    lm = high | low
    # block starts in buf space: b>0 -> lm[b+1]; b==0 -> lm[0] | lm[1]
    lm_next = np.zeros(n, bool)
    lm_next[:-1] = lm[1:]
    b = off  # buf index == within-segment offset during landmark phase
    is_b0 = valid & (b == 0)
    lm1 = np.zeros(n, bool)
    lm1[:-1] = lm[1:]
    starts_buf = (valid & (b > 0) & lm_next & (off + 1 < B)) | (
        is_b0 & (lm | (lm1 & (off + 1 < B)))
    )
    # shift to source offsets: buf index b lives at segment offset b, but
    # the block begins at source offset t3 + b
    starts_src = np.zeros(n, bool)
    idx = np.flatnonzero(starts_buf)
    if len(idx):
        tgt = idx + t3[idx]
        starts_src[tgt] = True
    return starts_src


def _blocks_vec(src: np.ndarray, alphabet: int):
    """Compute the pre-adjust block list as (lengths, types) arrays."""
    n = len(src)
    src = np.asarray(src, np.uint32)
    eq = src[:-1] == src[1:]
    run_member = np.zeros(n, bool)
    run_member[:-1] |= eq
    run_member[1:] |= eq
    prev_rm = np.zeros(n, bool)
    prev_rm[1:] = run_member[:-1]
    changed = np.ones(n, bool)
    changed[1:] = src[1:] != src[:-1]
    seg_start = (run_member != prev_rm) | (run_member & prev_rm & changed)
    seg_start[0] = True
    seg_id = np.cumsum(seg_start) - 1
    starts = np.flatnonzero(seg_start)
    seg_len_arr = np.diff(np.append(starts, n))
    pos_start = starts[seg_id - 0]
    seg_len = seg_len_arr[seg_id]
    off = np.arange(n) - pos_start
    is_t2 = ~run_member

    t = iter_log(alphabet)
    t3 = np.minimum(t, seg_len)

    is_start = np.zeros(n, bool)
    btype = np.zeros(n, np.int8)

    # type-1 runs
    r_start, _ = _mb13_starts(off, seg_len)
    run_sel = (~is_t2) & r_start
    is_start |= run_sel
    btype[run_sel] = 1

    # type-3 prefixes (eager_mb13(t3, 3)) — closed form over off < t3
    p_start, _ = _mb13_starts(off, t3)
    pre_sel = is_t2 & (off < t3) & p_start
    is_start |= pre_sel
    btype[pre_sel] = 3

    # type-2 landmark blocks over the reduced buffer
    lm_src = _type2_landmark_starts(src, pos_start, seg_len, off, is_t2, t)
    lm_sel = lm_src & ~is_start
    is_start |= lm_src
    btype[lm_sel] = 2

    bpos = np.flatnonzero(is_start)
    lens = np.diff(np.append(bpos, n)).astype(np.int64)
    types = btype[bpos].astype(np.int64)
    return lens, types


# --- exact _adjust_blocks queue semantics on a python list (mirror of
# compressors/esp.py:_adjust_blocks; operates on [len, type] pairs)


def _adjust_list(blocks):
    from ..compressors.esp import _adjust_blocks

    return _adjust_blocks([list(b) for b in blocks])


def _adjust_vec(lens: np.ndarray, types: np.ndarray):
    """Adjust pass: identity outside +-3-block windows around len-1 blocks."""
    ones = np.flatnonzero(lens == 1)
    if len(ones) == 0:
        return lens, types
    nb = len(lens)
    lo = np.maximum(ones - 3, 0)
    hi = np.minimum(ones + 4, nb)
    # merge overlapping windows
    intervals = []
    cl, ch = int(lo[0]), int(hi[0])
    for a, b in zip(lo[1:], hi[1:]):
        if a <= ch:
            ch = max(ch, int(b))
        else:
            intervals.append((cl, ch))
            cl, ch = int(a), int(b)
    intervals.append((cl, ch))
    out_l, out_t = [], []
    cursor = 0
    for a, b in intervals:
        if a > cursor:
            out_l.append(lens[cursor:a])
            out_t.append(types[cursor:a])
        sim = _adjust_list(np.stack([lens[a:b], types[a:b]], axis=1))
        sim = np.asarray(sim, np.int64).reshape(-1, 2)
        out_l.append(sim[:, 0])
        out_t.append(sim[:, 1])
        cursor = b
    if cursor < nb:
        out_l.append(lens[cursor:])
        out_t.append(types[cursor:])
    return np.concatenate(out_l), np.concatenate(out_t)


def _name_blocks(src: np.ndarray, lens: np.ndarray, alphabet: int):
    """Sort-based GrammarRules naming: first-appearance rank ids."""
    src = np.asarray(src, np.int64)
    nb = len(lens)
    bpos = np.concatenate([[0], np.cumsum(lens)[:-1]])
    is3 = lens == 3
    ncalls = nb + int(is3.sum())
    # call layout: block k occupies call slots base[k] (inner/only) and
    # base[k]+1 (outer, 3-blocks)
    base = np.concatenate([[0], np.cumsum(1 + is3.astype(np.int64))[:-1]])
    # inner keys for every block: (src[p], src[p+1])
    a = src[bpos]
    b = src[bpos + 1]
    inner_key = (a << 32) | b
    # inner dedup: group id + first call position per group
    uniq_inner, inv_inner = np.unique(inner_key, return_inverse=True)
    first_call_inner = np.full(len(uniq_inner), np.iinfo(np.int64).max)
    np.minimum.at(first_call_inner, inv_inner, base)
    # outer canonical keys for 3-blocks: (G + inner_group, c)
    out_blocks = np.flatnonzero(is3)
    c = src[bpos[out_blocks] + 2]
    outer_key = ((inv_inner[out_blocks].astype(np.int64)) << 32) | c
    uniq_outer, inv_outer = np.unique(outer_key, return_inverse=True)
    first_call_outer = np.full(len(uniq_outer), np.iinfo(np.int64).max)
    np.minimum.at(first_call_outer, inv_outer, base[out_blocks] + 1)
    # rank all first-occurrence call positions
    firsts = np.concatenate([first_call_inner, first_call_outer])
    order = np.argsort(firsts, kind="stable")
    ids = np.empty(len(firsts), np.int64)
    ids[order] = np.arange(len(firsts))
    id_inner = ids[: len(uniq_inner)]
    id_outer = ids[len(uniq_inner):]
    # rules content in id order
    K = len(firsts)
    rl = np.zeros(K, np.uint32)
    rr = np.zeros(K, np.uint32)
    ka = (uniq_inner >> 32).astype(np.uint32)
    kb = (uniq_inner & 0xFFFFFFFF).astype(np.uint32)
    rl[id_inner] = ka
    rr[id_inner] = kb
    # outer rule (alphabet + x_inner, c)
    x = id_inner[(uniq_outer >> 32).astype(np.int64)]
    rl[id_outer] = (alphabet + x).astype(np.uint32)
    rr[id_outer] = (uniq_outer & 0xFFFFFFFF).astype(np.uint32)
    # nxt: id of the last call of each block
    nxt = np.empty(nb, np.uint32)
    nxt[~is3] = id_inner[inv_inner[~is3]]
    nxt[out_blocks] = id_outer[inv_outer]
    return nxt, rl, rr


def esp_round_vec(src: np.ndarray, alphabet: int):
    """One ESP round, vectorized; mirrors esp_round_python bit-exactly."""
    src = np.asarray(src, np.uint32)
    lens, types = _blocks_vec(src, alphabet)
    lens, types = _adjust_vec(lens, types)
    assert int(lens.sum()) == len(src)
    return _name_blocks(src, lens, alphabet)
