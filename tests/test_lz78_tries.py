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
