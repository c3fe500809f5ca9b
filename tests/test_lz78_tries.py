"""LZ78 trie axis tests (mirror of test/lz78_trie_tests.cpp coverage goals:
every trie id yields the same factorization and roundtrips)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu.compressors.lz78 import lz78_parse
from tudocomp_tpu.compressors.lzw import lzw_parse
from tudocomp_tpu.registry import REGISTRY

ALL_TRIES = REGISTRY.names("lz78trie")
POINTER_TRIES = ["binary", "binarysorted", "ternary"]
NATIVE_TRIES = POINTER_TRIES + [
    "cedar",  # double-array
    "exthash",  # separate chaining
    "rolling",  # fingerprint-keyed
    "rolling_plus",
    "compact_sparse_hash",  # sparse-group table
]


def test_axis_registered():
    # the reference registers 10 trie ids (registry_config.py:109-120)
    for t in (
        "binary",
        "binarysorted",
        "cedar",
        "exthash",
        "hash",
        "hash_plus",
        "rolling",
        "rolling_plus",
        "ternary",
        "compact_sparse_hash",
    ):
        assert t in ALL_TRIES, t


@pytest.mark.parametrize("trie", NATIVE_TRIES)
def test_factors_match_hash_trie(trie):
    # expected factor lists are trie-independent (lz78_trie_tests.cpp checks
    # per-trie structure; the contract here is identical find_or_insert
    # semantics, hence identical factors)
    for t in CORPUS + generator_strings():
        a = np.frombuffer(t, np.uint8)
        p0, c0 = lz78_parse(a, "hash")
        p, c = lz78_parse(a, trie)
        assert (p == p0).all() and (c == c0).all(), (trie, t[:30])
        assert (lzw_parse(a, trie) == lzw_parse(a, "hash")).all(), (trie, t[:30])


@pytest.mark.parametrize("trie", NATIVE_TRIES + ["hash"])
def test_roundtrip_per_trie(trie):
    for t in CORPUS:
        roundtrip(f"lz78(coder=bit, lz78trie={trie})", t)
        roundtrip(f"lzw(coder=bit, lz78trie={trie})", t)


def test_expected_factors_banana():
    # lz78 on 'abcdebcdeabc' (lz78_trie_tests.cpp test string):
    # a|b|c|d|e|bc|de|ab|c -> parents/chars
    # factors: a|b|c|d|e|bc|de|ab|c(trailing partial, parent 0)
    p, c = lz78_parse(np.frombuffer(b"abcdebcdeabc", np.uint8))
    assert list(p) == [0, 0, 0, 0, 0, 2, 4, 1, 0]
    assert bytes(list(c)) == b"abcdecebc"


def test_compact_sparse_hash_structure():
    """The compact_sparse_hash backend is the real quotienting structure
    (util/compact_sparse_hash.hpp:61-1213 semantics): bit-packed quotient
    buckets must undercut a dense (u64 key + u32 val)/slot table by >2x,
    the quotient must be narrower than the key, and the parse must stay
    factor-identical to every other backend."""
    import numpy as np

    from tudocomp_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "tdc_csh_footprint"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    data = np.asarray(rng.integers(97, 105, 200_000), np.uint8)
    out = np.zeros(4, np.int64)
    nf = lib.tdc_csh_footprint(data, len(data), out)
    footprint, entries, cap, quot_width = (int(x) for x in out)
    assert nf > 0 and entries > 1000
    assert cap >= 2 * entries  # grow keeps load <= 0.5
    # quotienting: stored bits per key < full key width
    key_width = int(np.ceil(np.log2(entries))) + 8
    assert 0 < quot_width < key_width
    dense_bytes = cap * 12
    assert footprint * 2 < dense_bytes, (footprint, dense_bytes)

    p1 = np.zeros(len(data), np.uint32)
    c1 = np.zeros(len(data), np.uint8)
    p2 = np.zeros(len(data), np.uint32)
    c2 = np.zeros(len(data), np.uint8)
    n1 = lib.tdc_lz78_parse_trie(data, len(data), p1, c1, 7)
    n2 = lib.tdc_lz78_parse_trie(data, len(data), p2, c2, 3)
    assert n1 == n2
    assert (p1[:n1] == p2[:n2]).all() and (c1[:n1] == c2[:n2]).all()
