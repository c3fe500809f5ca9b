"""Device (TPU) ESP grammar construction.

Staged all-device ESP parsing: each round of the edit-sensitive parse
(EspContextImpl.hpp:14-165 in the reference) is one jitted array program
over a fixed padded size; rounds at sizes n, n/2, n/4, ... chain on device
with no host synchronization (the model proven out by the staged device
suffix array, ds/suffix_array.py). Output is bit-identical to the host
``generate_grammar`` — verified structurally by construction from the
vectorized specification in ``ops/esp_vec.py`` (whose numpy twin is tested
exhaustively against ``esp_round_python``) and cross-checked by tests.

Per-round passes (all elementwise / cumsum / lax.sort — TPU-friendly, no
gather chains):

1. segmentation into run (type-1) and non-repeating (type-2) metablocks;
2. closed-form eager_mb13 block starts for runs and type-3 prefixes;
3. label alphabet-reduction (4 masked steps), 3/4/5->mex replacement,
   high/low landmark rules, landmark block starts (meta_blocks.hpp);
4. the _adjust_blocks queue pass: identity outside ±3-block windows
   around (rare) length-1 blocks; inside, an exact 21-step queue-machine
   simulation vmapped over windows. Overlapping windows or window
   overflow set a fallback flag (host recomputes — semantics preserved);
5. GrammarRules naming by sorted first-appearance rank (two-level:
   3-blocks' outer rules key on the inner rule's group id).

Everything is int32 (no x64 on TPU): pair keys use 2-operand lax.sort
instead of u64 packing.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["esp_round_device", "esp_grammar_device"]

_I32MAX = np.int32(2**31 - 1)


def _ctz(x):
    """count-trailing-zeros of the lowest set bit via popcount(lsb-1)."""
    lsb = x & (-x)
    return lax.population_count(lsb - 1)


def _iter_log_dev(alphabet):
    return jnp.where(
        alphabet < 7,
        0,
        jnp.where(alphabet < 9, 1, jnp.where(alphabet < 17, 2, jnp.where(alphabet < 257, 3, 4))),
    ).astype(jnp.int32)


def _label_dev(left, right):
    diff = left ^ right
    l = jnp.where(diff != 0, _ctz(diff), 0)
    return 2 * l + ((right >> l) & 1)


def _shift_left(a, fill):
    return jnp.concatenate([a[1:], jnp.full((1,), fill, a.dtype)])


def _shift_right(a, fill):
    return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])


def _mb13_starts_dev(off, r):
    mod = r % 3
    m0 = (mod == 0) & (off % 3 == 0)
    m2 = (mod == 2) & (off % 3 == 0)
    m1 = (mod == 1) & (r > 1) & (
        ((off % 3 == 0) & (off < r - 4)) | (off == r - 4) | (off == r - 2)
    )
    return m0 | m2 | m1 | ((r == 1) & (off == 0))


# ---------------------------------------------------------------------------
# adjust-window queue machine (exact _adjust_blocks semantics)


def _sim_window(blk_len, blk_typ, navail):
    """Exact 3-slot queue simulation over one window (length = cap W).

    Returns (out_len[W], out_typ[W], out_count). Mirrors
    compressors/esp.py:_adjust_blocks on the window slice. The queue is
    held as six scalars (static indexing — the only per-step dynamic
    accesses are the input gather and the output scatter), and the loop
    is a while_loop so empty lanes cost nothing: under vmap the batched
    while runs only until the widest live span drains.
    """

    W = blk_len.shape[0]

    def cond(st):
        qn, ip = st[6], st[7]
        return (qn > 0) | (ip < navail)

    def body(st):
        l0, l1, l2, t0, t1, t2, qn, ip, op, out_len, out_typ = st
        can_fill = (qn < 3) & (ip < navail)
        any1 = ((l0 == 1) & (qn > 0)) | ((l1 == 1) & (qn > 1)) | ((l2 == 1) & (qn > 2))
        n01 = (l0 == 1) | (l1 == 1)
        n12 = (l1 == 1) | (l2 == 1)
        cond_a = (qn == 3) & any1 & n12 & (t1 == 2) & (t2 == 2)
        cond_b = (qn >= 2) & any1 & n01 & (t0 == 2) & (t1 == 2)
        cond_c = (qn >= 2) & any1 & n01 & (t0 == 3)
        cond_d = (qn >= 2) & any1 & n01 & ((t0 == 1) | (t1 == 1))
        cond_bcd = (~cond_a) & (cond_b | cond_c | cond_d)
        mtyp = jnp.where(cond_b, 2, jnp.where(cond_c, 3, 1)).astype(jnp.int32)
        # fill takes priority; the count updates below are independent
        # where()s, so the merge flag must be masked out explicitly
        can_merge = (cond_a | cond_bcd) & ~can_fill
        mt = jnp.where(cond_a, 2, mtyp)
        can_pop = (~can_fill) & (~can_merge) & (qn > 0)

        # --- fill (slot qn gets blk[ip])
        ipc = jnp.clip(ip, 0, W - 1)
        bl = blk_len[ipc]
        bt = blk_typ[ipc]
        f_l0 = jnp.where(qn == 0, bl, l0)
        f_t0 = jnp.where(qn == 0, bt, t0)
        f_l1 = jnp.where(qn == 1, bl, l1)
        f_t1 = jnp.where(qn == 1, bt, t1)
        f_l2 = jnp.where(qn == 2, bl, l2)
        f_t2 = jnp.where(qn == 2, bt, t2)

        # --- merge at (mi, mi+1): mi = 1 for cond_a else 0
        s = jnp.where(cond_a, l1 + l2, l0 + l1)
        small = (s == 2) | (s == 3)
        # small, mi=0: [s, l2, *]; small, mi=1: [l0, s, *]
        sm_l0 = jnp.where(cond_a, l0, s)
        sm_t0 = jnp.where(cond_a, t0, mt)
        sm_l1 = jnp.where(cond_a, s, l2)
        sm_t1 = jnp.where(cond_a, mt, t2)
        # big (s==4), mi=0: [2, 2, l2]; mi=1: [l0, 2, 2]
        bg_l0 = jnp.where(cond_a, l0, 2)
        bg_t0 = jnp.where(cond_a, t0, mt)
        bg_l1 = jnp.int32(2)
        bg_t1 = mt
        bg_l2 = jnp.where(cond_a, 2, l2)
        bg_t2 = jnp.where(cond_a, mt, t2)
        m_l0 = jnp.where(small, sm_l0, bg_l0)
        m_t0 = jnp.where(small, sm_t0, bg_t0)
        m_l1 = jnp.where(small, sm_l1, bg_l1)
        m_t1 = jnp.where(small, sm_t1, bg_t1)
        m_l2 = jnp.where(small, l2, bg_l2)
        m_t2 = jnp.where(small, t2, bg_t2)

        # --- pop (emit q0, shift down)
        opc = jnp.clip(op, 0, W - 1)
        out_len = out_len.at[opc].set(jnp.where(can_pop, l0, out_len[opc]))
        out_typ = out_typ.at[opc].set(jnp.where(can_pop, t0, out_typ[opc]))

        def sel(f, m, p, cur):
            return jnp.where(
                can_fill, f, jnp.where(can_merge, m, jnp.where(can_pop, p, cur))
            )

        n_l0 = sel(f_l0, m_l0, l1, l0)
        n_t0 = sel(f_t0, m_t0, t1, t0)
        n_l1 = sel(f_l1, m_l1, l2, l1)
        n_t1 = sel(f_t1, m_t1, t2, t1)
        n_l2 = sel(f_l2, m_l2, l2, l2)
        n_t2 = sel(f_t2, m_t2, t2, t2)
        qn = (
            qn
            + jnp.where(can_fill, 1, 0)
            - jnp.where(can_merge & small, 1, 0)
            - jnp.where(can_pop, 1, 0)
        )
        ip = ip + jnp.where(can_fill, 1, 0)
        op = op + jnp.where(can_pop, 1, 0)
        return (n_l0, n_l1, n_l2, n_t0, n_t1, n_t2, qn, ip, op, out_len, out_typ)

    z = jnp.int32(0)
    init = (
        z, z, z, z, z, z, z, z, z,
        jnp.zeros(W, jnp.int32),
        jnp.zeros(W, jnp.int32),
    )
    if W <= 16:
        # partially unrolled scan: a batched while_loop costs ~3 ms *per
        # iteration* in dispatch/mask overhead on TPU, while a full 3*W
        # unroll explodes XLA compile time — scan(unroll=8) fuses 8 steps
        # per dispatch at 1/6 of the full-unroll graph. Extra steps after
        # a lane drains are no-ops (state is stable).
        def sbody(st, _):
            return body(st), None

        st, _ = lax.scan(sbody, init, None, length=3 * W, unroll=8)
    else:
        st = lax.while_loop(cond, body, init)
    return st[9], st[10], st[8]


_W1 = 16  # narrow-span window width (covers the typical merged span)
_W2 = 128  # wide-span window width (p100 on measured corpora is 77)


def _tier_sim(lens, typs, ws_arr, na_arr, W):
    """Gather each span's blocks and run the queue machine (vmapped).

    Returns (unused, out_len, out_typ, major/minor splice keys)."""
    size = lens.shape[0]
    j = jnp.arange(W, dtype=jnp.int32)
    gidx = jnp.clip(ws_arr[:, None] + j[None, :], 0, size - 1)
    wlen = jnp.take(lens, gidx, axis=0)
    wtyp = jnp.take(typs, gidx, axis=0)
    out_len, out_typ, out_cnt = jax.vmap(_sim_window)(wlen, wtyp, na_arr)
    live = na_arr > 0
    wo_valid = live[:, None] & (j[None, :] < out_cnt[:, None])
    major = jnp.where(wo_valid, ws_arr[:, None], _I32MAX)
    minor = jnp.broadcast_to(j[None, :], major.shape)
    return None, out_len, out_typ, major, minor


def _adjust_dev(lens, typs, nb, nw_cap=None):
    """Vectorized adjust pass. Returns (lens, typs, nb, fallback).

    Identity outside merged ±3-block spans around length-1 blocks; exact
    queue simulation inside. Spans are unions of overlapping [i-3, i+4)
    windows (the same construction as ops/esp_vec._adjust_vec); narrow
    spans (≤16 blocks, the common case) run as an unrolled vmapped tier,
    wide spans (≤128) as a batched while tier. Cap overflow or over-wide
    spans set the fallback flag. The whole machinery sits behind a
    lax.cond: rounds without length-1 blocks (most rounds past the first)
    pay only the ones-count reduction and one sort."""
    size = lens.shape[0]
    OC = size // 12 + 8  # compacted ones cap (max measured density 1/15)
    NS = OC  # span cap (spans ≤ ones)
    CAP2 = size // 512 + 8  # wide-span cap
    bidx = jnp.arange(size, dtype=jnp.int32)
    valid = bidx < nb
    is_one = valid & (lens == 1)
    n_ones = jnp.sum(is_one.astype(jnp.int32))

    def no_ones(_):
        return lens, typs, nb, jnp.bool_(False)

    def with_ones(_):
        # compacted sorted one-positions (padding sorts last)
        okey = jnp.where(is_one, bidx, _I32MAX)
        opos = lax.sort(okey)[:OC]
        oi = jnp.arange(OC, dtype=jnp.int32)
        one_valid = opos < _I32MAX
        prev_o = _shift_right(opos, jnp.int32(-(1 << 30)))
        head = one_valid & ((oi == 0) | (opos - prev_o >= 7))
        sid = jnp.cumsum(head.astype(jnp.int32)) - 1
        ns = jnp.sum(head.astype(jnp.int32))
        slot = jnp.where(one_valid, jnp.minimum(sid, NS), NS)
        ws = jnp.zeros(NS + 1, jnp.int32).at[jnp.where(head, slot, NS)].set(opos - 3)[:NS]
        we = jnp.zeros(NS + 1, jnp.int32).at[slot].max(opos + 4)[:NS]
        span_valid = jnp.arange(NS, dtype=jnp.int32) < ns
        ws_c = jnp.where(span_valid, jnp.maximum(ws, 0), 0)
        we_c = jnp.where(span_valid, jnp.minimum(we, nb), 0)
        width = we_c - ws_c

        small = span_valid & (width <= _W1)
        big = span_valid & (width > _W1)
        n2 = jnp.sum(big.astype(jnp.int32))
        fallback = (n_ones > OC) | (n2 > CAP2) | jnp.any(width > _W2)

        # route spans into tier lane arrays
        t1 = jnp.cumsum(small.astype(jnp.int32)) - 1
        t2 = jnp.cumsum(big.astype(jnp.int32)) - 1
        ws1 = jnp.zeros(NS + 1, jnp.int32).at[jnp.where(small, t1, NS)].set(ws_c)[:NS]
        na1 = jnp.zeros(NS + 1, jnp.int32).at[jnp.where(small, t1, NS)].set(width)[:NS]
        ws2 = jnp.zeros(CAP2 + 1, jnp.int32).at[jnp.where(big & (t2 < CAP2), t2, CAP2)].set(ws_c)[:CAP2]
        na2 = jnp.zeros(CAP2 + 1, jnp.int32).at[jnp.where(big & (t2 < CAP2), t2, CAP2)].set(
            jnp.minimum(width, _W2)
        )[:CAP2]

        _rep1, ol1, ot1, maj1, min1 = _tier_sim(lens, typs, ws1, na1, _W1)
        _rep2, ol2, ot2, maj2, min2 = _tier_sim(lens, typs, ws2, na2, _W2)

        # replaced = inside the span union = within 3 blocks of a one
        # (scan formulation — no scatters)
        prev_one = lax.cummax(jnp.where(is_one, bidx, jnp.int32(-(1 << 30))))
        next_neg = lax.cummax(jnp.flip(jnp.where(is_one, -bidx, jnp.int32(-(1 << 30)))))
        next_one = -jnp.flip(next_neg)
        replaced = valid & ((bidx - prev_one <= 3) | (next_one - bidx <= 3))

        # splice with a (major, minor) 2-key sort: identity block b ->
        # (b, 0), span outputs -> (span start, j); spans are disjoint and
        # replace their whole [ws, we) range, so majors never collide
        id_major = jnp.where(valid & ~replaced, bidx, _I32MAX)
        id_minor = jnp.zeros(size, jnp.int32)
        majors = jnp.concatenate([id_major, maj1.reshape(-1), maj2.reshape(-1)])
        minors = jnp.concatenate([id_minor, min1.reshape(-1), min2.reshape(-1)])
        vlen = jnp.concatenate([lens, ol1.reshape(-1), ol2.reshape(-1)])
        vtyp = jnp.concatenate([typs, ot1.reshape(-1), ot2.reshape(-1)])
        smaj, _, slen, styp = lax.sort((majors, minors, vlen, vtyp), num_keys=2)
        new_nb = jnp.sum((majors < _I32MAX).astype(jnp.int32))
        return slen[:size], styp[:size], new_nb, fallback

    return lax.cond(n_ones > 0, with_ones, no_ones, None)


# ---------------------------------------------------------------------------
# one full round at a static padded size


def _stage_blocks(src, m, alphabet, *, size):
    """Pre-adjust block computation: returns (lens, types, nb)."""
    i = jnp.arange(size, dtype=jnp.int32)
    inb = i < m
    t = _iter_log_dev(alphabet)

    # --- segmentation
    nxt_sym = _shift_left(src, 0)
    eq = inb & (i + 1 < m) & (src == nxt_sym)
    eq_prev = _shift_right(eq, False)
    run_member = eq | eq_prev
    prev_rm = _shift_right(run_member, False)
    changed = (src != _shift_right(src, -1)) | (i == 0)
    seg_start = inb & ((run_member != prev_rm) | (run_member & prev_rm & changed) | (i == 0))
    pos_start = lax.cummax(jnp.where(seg_start, i, -1))
    # segment end = next seg start (exclusive scan from the right), capped at m
    rev = jnp.flip(jnp.where(seg_start, i, _I32MAX))
    nxt_start = jnp.flip(lax.cummin(jnp.concatenate([jnp.full((1,), _I32MAX, jnp.int32), rev[:-1]])))
    seg_end = jnp.minimum(nxt_start, m)
    seg_len = seg_end - pos_start
    off = i - pos_start
    is_t2 = inb & ~run_member
    t3 = jnp.minimum(t, seg_len)
    B = seg_len - t3

    # --- type-1 runs + type-3 prefixes (closed-form mb13)
    is_start = jnp.zeros(size, jnp.bool_)
    btype = jnp.zeros(size, jnp.int32)
    run_sel = inb & run_member & _mb13_starts_dev(off, seg_len)
    is_start |= run_sel
    btype = jnp.where(run_sel, 1, btype)
    pre_sel = is_t2 & (off < t3) & _mb13_starts_dev(off, t3)
    is_start |= pre_sel
    btype = jnp.where(pre_sel, 3, btype)

    # --- alphabet reduction + mex + landmarks over the reduced buffer
    cur = src
    for k in range(4):
        mask = is_t2 & (k < t) & (off <= seg_len - k - 2)
        cur = jnp.where(mask, _label_dev(cur, _shift_left(cur, 0)), cur)
    bvalid = is_t2 & (off < B)
    for v in (3, 4, 5):
        left = _shift_right(cur, -1)
        right = _shift_left(cur, -1)
        has_l = bvalid & (off > 0)
        has_r = bvalid & (off + 1 < B)
        lv = jnp.where(has_l, left, -1)
        rv = jnp.where(has_r, right, -1)
        e = jnp.zeros(size, jnp.int32)
        for _ in range(2):
            e = jnp.where((lv == e) | (rv == e), e + 1, e)
            e = jnp.where((lv == e) | (rv == e), e + 1, e)
        cur = jnp.where(bvalid & (cur == v), e, cur)
    left = _shift_right(cur, -1)
    right = _shift_left(cur, -1)
    has_l = bvalid & (off > 0)
    has_r = bvalid & (off + 1 < B)
    high = bvalid & ~(has_l & (left > cur)) & ~(has_r & (right > cur))
    high_l = _shift_right(high, False)
    high_r = _shift_left(high, False)
    low = (
        bvalid
        & ~(has_l & (left < cur))
        & ~(has_r & (right < cur))
        & ~(has_l & high_l)
        & ~(has_r & high_r)
    )
    lm = high | low
    lm1 = _shift_left(lm, False)
    starts_buf = (bvalid & (off > 0) & lm1 & (off + 1 < B)) | (
        bvalid & (off == 0) & (lm | (lm1 & (off + 1 < B)))
    )
    # scatter buf starts to source offsets (+t3)
    tgt = jnp.where(starts_buf, i + t3, size)
    lm_src = jnp.zeros(size + 1, jnp.bool_).at[tgt].set(True)[:size]
    is_start |= lm_src
    btype = jnp.where(lm_src & ~run_sel & ~pre_sel, 2, btype)

    # --- compact blocks: positions + lengths + types
    bkey = jnp.where(is_start, i, _I32MAX)
    bpos_s, btyp_s = lax.sort((bkey, btype), num_keys=1)
    nb = jnp.sum(is_start.astype(jnp.int32))
    nxt_pos = jnp.minimum(_shift_left(bpos_s, _I32MAX), m)
    lens = jnp.where(bpos_s < _I32MAX, nxt_pos - bpos_s, 0).astype(jnp.int32)
    return lens, btyp_s, nb


def _stage_naming(src, m, alphabet, lens, typs, nb, *, size):
    """GrammarRules naming by sorted first-appearance ranks.

    Works on half-size block arrays — every post-adjust block spans ≥2
    symbols, so nb ≤ m/2 ≤ size/2 — which halves every sort and scatter.
    Returns (nxt [size//2], rl [size], rr [size], K)."""
    half = size // 2
    H = half
    lens = lens[:H]
    bi = jnp.arange(H, dtype=jnp.int32)
    bvalid2 = bi < nb
    bpos = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens)[:-1]]).astype(jnp.int32)
    is3 = bvalid2 & (lens == 3)
    callw = jnp.where(bvalid2, 1 + is3.astype(jnp.int32), 0)
    base = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(callw)[:-1]]).astype(jnp.int32)

    ga = jnp.where(bvalid2, src[jnp.clip(bpos, 0, size - 1)], _I32MAX)
    gb = jnp.where(bvalid2, src[jnp.clip(bpos + 1, 0, size - 1)], _I32MAX)
    gc = src[jnp.clip(bpos + 2, 0, size - 1)]

    # inner groups: sort blocks by (a, b, call). Groups are contiguous in
    # sorted order with the head holding the minimal call, so per-group
    # values propagate by cummax — no compaction scatters needed.
    sa, sb, sbase, sblk = lax.sort((ga, gb, base, bi), num_keys=3)
    head = (bi == 0) | (sa != _shift_right(sa, -1)) | (sb != _shift_right(sb, -1))
    head &= sa < _I32MAX
    gid_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    # inner group id per block (scatter back through the sort permutation)
    inv_inner = jnp.zeros(H + 1, jnp.int32).at[jnp.where(sa < _I32MAX, sblk, H)].set(gid_sorted)[:H]

    # outer groups for 3-blocks: key (inner gid, c)
    oga = jnp.where(is3, inv_inner, _I32MAX)
    ogc = jnp.where(is3, gc, _I32MAX)
    oa, oc, obase, oblk = lax.sort((oga, ogc, base + 1, bi), num_keys=3)
    ohead = ((bi == 0) | (oa != _shift_right(oa, -1)) | (oc != _shift_right(oc, -1))) & (oa < _I32MAX)
    ogid = jnp.cumsum(ohead.astype(jnp.int32)) - 1
    inv_outer = jnp.zeros(H + 1, jnp.int32).at[jnp.where(oa < _I32MAX, oblk, H)].set(ogid)[:H]

    # rank first-appearances over both levels in one sort that carries the
    # rule content: after sorting by first-call position, row r IS rule r.
    # A group's first call is its head's own base (groups sort by call
    # within the key), so heads carry it directly.
    fi = jnp.where(head, sbase, _I32MAX)
    fo = jnp.where(ohead, obase, _I32MAX)
    firsts = jnp.concatenate([fi, fo])
    isout = jnp.concatenate(
        [jnp.zeros(H, jnp.int32), jnp.ones(H, jnp.int32)]
    )
    ca = jnp.concatenate([sa, oa])  # inner: symbol a; outer: ref inner gid
    cb = jnp.concatenate([sb, oc])
    cg = jnp.concatenate([gid_sorted, ogid])
    sf, souts, sca, scb, scg = lax.sort(
        (firsts, isout, ca, cb, cg), num_keys=1
    )
    K = jnp.sum((firsts < _I32MAX).astype(jnp.int32))
    r = jnp.arange(2 * H, dtype=jnp.int32)
    rvalid = sf < _I32MAX
    # group -> rule id table (inner groups at [0, H), outer at [H, 2H))
    idtab = jnp.zeros(2 * H + 1, jnp.int32).at[
        jnp.where(rvalid, scg + souts * H, 2 * H)
    ].set(r)[: 2 * H]

    # rules content in id order (K ≤ 2H = size rows, all up front)
    rl_s = jnp.where(
        souts == 1,
        alphabet + idtab[jnp.clip(sca, 0, H - 1)],
        sca,
    )
    rl = jnp.where(rvalid, rl_s, 0)
    rr = jnp.where(rvalid, scb, 0)

    # next string: id of the last call per block
    id_inner_g = idtab[:H]
    id_outer_g = idtab[H:]
    nxt = jnp.where(
        is3,
        id_outer_g[jnp.clip(inv_outer, 0, H - 1)],
        id_inner_g[jnp.clip(inv_inner, 0, H - 1)],
    )
    nxt = jnp.where(bvalid2, nxt, 0)
    return nxt, rl, rr, K


def _round_body(src, m, alphabet, *, size, nw_cap):
    """One ESP round. src: [size] i32 (valid prefix m). Returns
    (nxt [size//2] i32, nb, rl [size] i32, rr [size] i32, K, fallback)."""
    half = size // 2
    lens, typs, nb = _stage_blocks(src, m, alphabet, size=size)
    lens, typs, nb, fallback = _adjust_dev(lens, typs, nb, nw_cap)
    nxt, rl, rr, K = _stage_naming(src, m, alphabet, lens, typs, nb, size=size)

    # pass-through gate for m <= 1 (round must not run; mirrors the host
    # loop stopping at length 1)
    done = m <= 1
    nxt = jnp.where(done, src[:half], nxt)
    nb = jnp.where(done, m, nb)
    K = jnp.where(done, 0, K)
    fallback = jnp.where(done, False, fallback)
    return nxt, nb, rl, rr, K, fallback


@functools.lru_cache(maxsize=None)
def _round_jit(size: int, nw_cap: int):
    return jax.jit(functools.partial(_round_body, size=size, nw_cap=nw_cap))


@functools.lru_cache(maxsize=None)
def _round_jit_batch(size: int, nw_cap: int):
    return jax.jit(
        jax.vmap(functools.partial(_round_body, size=size, nw_cap=nw_cap))
    )


def esp_round_device_batch(srcs, alphabets):
    """Batched single-round entry (testing): many same-padded-size strings
    in one dispatch. Returns a list of (nxt, rl, rr) / None per input."""
    from ..device import ensure_compile_cache

    ensure_compile_cache()
    size = 8
    mx = max(len(s) for s in srcs)
    while size < mx:
        size *= 2
    batch = np.zeros((len(srcs), size), np.int32)
    ms = np.zeros(len(srcs), np.int32)
    for k, s in enumerate(srcs):
        batch[k, : len(s)] = np.asarray(s, np.int64).astype(np.int32)
        ms[k] = len(s)
    nxt, nb, rl, rr, K, fb = _round_jit_batch(size, max(8, size // 8))(
        jnp.asarray(batch), jnp.asarray(ms), jnp.asarray(alphabets, np.int32)
    )
    nxt, nb, rl, rr, K, fb = (np.asarray(x) for x in (nxt, nb, rl, rr, K, fb))
    out = []
    for k in range(len(srcs)):
        if fb[k]:
            out.append(None)
        else:
            out.append(
                (
                    nxt[k, : nb[k]].astype(np.uint32),
                    rl[k, : K[k]].astype(np.uint32),
                    rr[k, : K[k]].astype(np.uint32),
                )
            )
    return out


def esp_round_device(src: np.ndarray, alphabet: int):
    """Single-round entry (testing): mirrors esp_round_python bit-exactly.

    Returns (nxt, rl, rr) or None if the round hit the window-fallback.
    """
    from ..device import ensure_compile_cache

    ensure_compile_cache()
    m = len(src)
    size = 8
    while size < m:
        size *= 2
    pad = np.zeros(size, np.int32)
    pad[:m] = np.asarray(src, np.int64).astype(np.int32)
    nxt, nb, rl, rr, K, fb = _round_jit(size, max(8, size // 8))(
        jnp.asarray(pad), jnp.int32(m), jnp.int32(alphabet)
    )
    if bool(fb):
        return None
    nb = int(nb)
    K = int(K)
    return (
        np.asarray(nxt)[:nb].astype(np.uint32),
        np.asarray(rl)[:K].astype(np.uint32),
        np.asarray(rr)[:K].astype(np.uint32),
    )


def esp_grammar_device(data, threshold: int = 1 << 15, devices=None):
    """Full grammar construction: device rounds down to `threshold`, host
    finish. Bit-identical to compressors.esp.generate_grammar; falls back
    to the host path entirely if any device round trips its window cap.
    """
    from ..compressors.esp import esp_round, generate_grammar
    from ..device import ensure_compile_cache

    data = np.asarray(data, np.uint8)
    n = len(data)
    if n <= 1 or n <= 2 * threshold:
        return generate_grammar(data)
    ensure_compile_cache()

    size = 1
    while size < n:
        size *= 2
    pad = np.zeros(size, np.int32)
    pad[:n] = data
    src = jnp.asarray(pad)
    m = jnp.int32(n)
    alphabet = jnp.int32(256)
    stage_out = []
    while size // 2 >= threshold:
        nxt, nb, rl, rr, K, fb = _round_jit(size, max(8, size // 8))(src, m, alphabet)
        stage_out.append((rl, rr, K, fb, nb))
        src, m, alphabet = nxt, nb, K
        size //= 2

    # one sync: counts + flags
    counts = np.asarray(jnp.stack([s[2] for s in stage_out]))
    flags = np.asarray(jnp.stack([s[3] for s in stage_out]))
    nbs = np.asarray(jnp.stack([s[4] for s in stage_out]))
    if flags.any():
        return generate_grammar(data)

    all_rules = []
    slp_counter = 256
    prev_slp_counter = 0
    cur_m = n
    root = None
    for idx, (rl, rr, _K, _fb, _nb) in enumerate(stage_out):
        if cur_m == 1:
            break
        k = int(counts[idx])
        pairs = np.stack(
            [np.asarray(rl[:k]), np.asarray(rr[:k])], axis=1
        ).astype(np.int64) + prev_slp_counter
        all_rules.append(pairs)
        prev_slp_counter = slp_counter
        slp_counter += k
        cur_m = int(nbs[idx])
    if cur_m == 1:
        root = int(np.asarray(src[:1])[0]) + prev_slp_counter
    else:
        # host finish on the residual string
        string = np.asarray(src[:cur_m]).astype(np.uint32)
        alpha = int(counts[len(all_rules) - 1]) if all_rules else 256
        while True:
            if len(string) == 1:
                root = int(string[0]) + prev_slp_counter
                break
            nxt, rl_h, rr_h = esp_round(string, alpha)
            pairs = np.stack([rl_h, rr_h], axis=1).astype(np.int64) + prev_slp_counter
            all_rules.append(pairs)
            prev_slp_counter = slp_counter
            slp_counter += len(rl_h)
            string = nxt
            alpha = len(rl_h)
    rules = np.concatenate(all_rules) if all_rules else np.zeros((0, 2), np.int64)
    return rules, root, False
