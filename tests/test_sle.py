"""SLE coder tests."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, roundtrip
from tudocomp_tpu.driver import compress, decompress


@pytest.mark.parametrize("kmer", [1, 2, 3, 4])
def test_corpus(kmer):
    for text in CORPUS:
        roundtrip(f"encode(sle(kmer={kmer}))", text)


def test_in_lcpcomp_and_lzss(*, _algs=("lcpcomp(coder=sle)", "lzss_lcp(coder=sle)")):
    for alg in _algs:
        for text in CORPUS:
            roundtrip(alg, text)


def test_kmer_gains_on_kmer_rich_input():
    # input dominated by repeated 3-grams: sle(kmer=3) should beat kmer=1
    data = (b"abc" * 500) + b"xyz"
    c3 = compress("encode(sle(kmer=3))", data)
    c1 = compress("encode(sle(kmer=1))", data)
    assert decompress(c3) == data
    assert len(c3) < len(c1)


def test_chain_with_escaping_bytes():
    # regression: chained restriction unwrapping (escape-pool bytes through
    # a bwt chain) — previously leaked escaped bytes
    for data in (b"\x00", b"\xff\xfe\x00", bytes(range(256))):
        for alg in ("bwt:encode(sle)", "bwt:mtf:encode(huff)"):
            c = compress(alg, data)
            assert decompress(c) == data, (alg, data[:16])
