"""Container & IO edge-case depth.

The reference exercises IntVector/IntPtr semantics in 1,314 lines
(test/generic_int_vector_tests.cpp) and Input/Output slicing+restriction
interplay in 710 (test/input_output_tests.cpp). These tests mirror the
corner cases that matter for this rebuild's representations: bit-width
boundaries and repack round trips for the packed vectors, Rank/Select at
block borders, and slice/restriction composition on Input/Output
(slice-of-slice, restricted slices, escape-cache sharing, merge
semantics, the escape pool itself appearing in the payload).
"""

from __future__ import annotations

import numpy as np
import pytest

from tudocomp_tpu.ds.int_vector import (
    BitVector,
    IntVector,
    Rank,
    Select,
    bits_for,
)
from tudocomp_tpu.io.inout import Input, Output
from tudocomp_tpu.io.restrict import InputRestrictions, escape, unescape


# ---------------------------------------------------------------------------
# IntVector


@pytest.mark.parametrize("width", [1, 2, 3, 7, 8, 9, 15, 16, 31, 32, 33, 63, 64])
def test_int_vector_width_boundaries(width):
    rng = np.random.default_rng(width)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, 257, dtype=np.uint64) if width < 64 else (
        rng.integers(0, 1 << 62, 257, dtype=np.uint64) * 4 + 3
    )
    vals[0] = 0
    vals[1] = hi if width < 64 else np.uint64(2**64 - 1)
    iv = IntVector(vals, width=width)
    assert iv.width == width and len(iv) == 257
    back = iv.to_array()
    assert (back == vals).all()
    # random single-element reads cross word boundaries for odd widths
    for i in (0, 1, 63, 64, 65, 127, 128, 255, 256):
        assert iv[i] == int(vals[i]), (width, i)


def test_int_vector_repack_roundtrip():
    vals = np.arange(1000, dtype=np.uint64) % 500
    iv = IntVector(vals, width=16)
    for w in (9, 10, 32, 64, 16):
        rp = iv.repack(w)
        assert rp.width == w
        assert (rp.to_array() == vals).all()
    # repack to a NARROWER width truncates like IntVector::width(w)
    narrow = IntVector(vals, width=16).repack(4)
    assert (narrow.to_array() == (vals & 0xF)).all()


def test_int_vector_no_aliasing_after_repack():
    vals = np.arange(64, dtype=np.uint64)
    a = IntVector(vals, width=8)
    b = a.repack(16)
    bv = b.to_array()
    bv_copy = bv.copy()
    # mutating one must not leak into the other (fresh word storage)
    a._words[:] = 0
    assert (b.to_array() == bv_copy).all()


def test_int_vector_empty_and_single():
    assert len(IntVector(np.zeros(0, np.uint64), width=13)) == 0
    one = IntVector(np.array([5], np.uint64), width=3)
    assert one[0] == 5 and list(one.to_array()) == [5]


def test_bits_for_contract():
    # bits_for(0) == 1 (util.hpp:185-196): zero still needs one bit
    assert bits_for(0) == 1
    assert bits_for(1) == 1
    assert bits_for(2) == 2
    assert bits_for(255) == 8
    assert bits_for(256) == 9
    assert bits_for((1 << 32) - 1) == 32


# ---------------------------------------------------------------------------
# Rank / Select at block borders


def test_rank_select_block_borders():
    # bits set exactly at 64-bit block borders and superblock edges
    n = 64 * 40 + 17
    bits = np.zeros(n, np.uint8)
    setpos = sorted({0, 63, 64, 65, 511, 512, 513, 64 * 39, n - 1})
    for p in setpos:
        bits[p] = 1
    bv = BitVector(bits)
    rk = Rank(bv)
    sel = Select(bv)
    csum = np.cumsum(bits)
    for i in (0, 1, 63, 64, 65, 511, 512, 513, n - 2, n - 1):
        assert rk.rank1(i) == int(csum[i]), i
    for k, p in enumerate(setpos, start=1):
        assert sel.select1(k) == p, (k, p)


# ---------------------------------------------------------------------------
# Input slicing + restrictions


def test_input_slice_of_slice():
    data = bytes(range(100))
    inp = Input(data)
    s1 = Input(inp, 10, 90)
    s2 = Input(s1, 5, 40)
    assert s2.as_bytes() == data[15:50]
    assert s2.size() == 35
    # empty slice
    assert Input(s2, 3, 3).as_bytes() == b""


def test_restricted_slice_escapes_only_the_slice():
    rest = InputRestrictions((0,), True)
    data = b"ab\x00cd\x00ef"
    whole = Input(data).with_restrictions(rest)
    sl = Input(Input(data), 3, 6).with_restrictions(rest)
    # the slice sees its own escaped+terminated view ("cd\0" escaped)
    arr = sl.as_array()
    assert arr[-1] == 0 and 0 not in arr[:-1]
    assert unescape(arr[:-1], rest).tobytes() == b"cd\x00"
    # and the whole input's view is independent
    w = whole.as_array()
    assert unescape(w[:-1], rest).tobytes() == data


def test_restriction_merge_is_union():
    a = InputRestrictions((0,), False)
    b = InputRestrictions((255,), True)
    m = a | b
    assert set(m.escape_bytes) == {0, 255}
    assert m.null_terminate
    # merge with empty is identity
    e = InputRestrictions()
    assert (a | e).escape_bytes == a.escape_bytes
    assert not (e | e).has_restrictions


def test_escape_pool_bytes_in_payload_roundtrip():
    # payload contains the escape-pool bytes themselves (255, 254, 192,
    # 193, 245..253) plus the restricted byte: escape must stay bijective
    pool = bytes([255, 254, 192, 193] + list(range(245, 254)))
    data = b"\x00" + pool + b"\x00" + pool[::-1]
    rest = InputRestrictions((0,), True)
    esc = escape(np.frombuffer(data, np.uint8), rest)
    assert 0 not in esc[:-1] and esc[-1] == 0
    back = unescape(esc[:-1], rest)
    assert back.tobytes() == data


def test_input_alloc_cache_shared_across_derived_views():
    rest = InputRestrictions((0,), True)
    base = Input(b"shared \x00 escape cache")
    a = base.with_restrictions(rest)
    b = base.with_restrictions(rest)
    arr_a = a.as_array()
    arr_b = b.as_array()
    # the InputAlloc-style cache materializes once per restriction set
    assert arr_a is arr_b
    # a different restriction set gets its own materialization
    c = base.with_restrictions(InputRestrictions((0, 255), True))
    assert c.as_array() is not arr_a


def test_output_unrestrict_wrapping():
    rest = InputRestrictions((0,), True)
    data = b"null \x00 bytes \x00 inside"
    esc = escape(np.frombuffer(data, np.uint8), rest)
    out = Output().with_restrictions(rest)
    out.write(esc)
    # finalize unescapes and strips the sentinel, like the driver's
    # decompress-side Output wrapping (tudocomp_driver.cpp:336-338)
    assert out.getvalue() == data


def test_input_from_memmap_path(tmp_path):
    big = tmp_path / "big.bin"
    payload = bytes(np.random.default_rng(0).integers(1, 255, 1 << 16).astype(np.uint8))
    big.write_bytes(payload)
    old = Input.MMAP_THRESHOLD
    try:
        Input.MMAP_THRESHOLD = 1 << 10  # force the memmap path
        inp = Input.from_path(big)
        assert inp.as_bytes() == payload
        assert Input(inp, 100, 200).as_bytes() == payload[100:200]
    finally:
        Input.MMAP_THRESHOLD = old
