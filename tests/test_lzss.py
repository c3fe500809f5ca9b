"""LZSS family tests: sliding window + LCP factorization + stream format."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import native
from tudocomp_tpu.driver import compress, decompress


CODERS = ["bit", "ascii", "gamma", "delta", "ternary"]


class TestSlidingWindow:
    @pytest.mark.parametrize("coder", CODERS)
    def test_corpus_roundtrip(self, coder):
        for text in CORPUS:
            roundtrip(f"lzss(coder={coder})", text)

    def test_generator_strings(self):
        for text in generator_strings():
            roundtrip("lzss(coder=bit)", text)

    def test_window_option(self):
        data = b"abcabcabc" * 50
        for window in (4, 16, 64):
            c = compress(f"lzss(coder=bit, window={window})", data)
            assert decompress(c) == data

    def test_python_fallback_matches_native(self):
        from tudocomp_tpu.compressors.lzss import window_parse

        lib = native.get_lib()
        if lib is None:
            pytest.skip("no native lib")
        rng = np.random.default_rng(0)
        for _ in range(30):
            n = int(rng.integers(0, 300))
            data = rng.integers(97, 101, n).astype(np.uint8)
            got = window_parse(data, 16, 3)
            orig = native.get_lib
            native.get_lib = lambda: None
            try:
                want = window_parse(data, 16, 3)
            finally:
                native.get_lib = orig
            for a, b in zip(got, want):
                assert (a == b).all()


class TestLZSSLCP:
    @pytest.mark.parametrize("coder", CODERS + ["huff"])
    def test_corpus_roundtrip(self, coder):
        for text in CORPUS:
            roundtrip(f"lzss_lcp(coder={coder})", text)

    def test_generator_strings(self):
        for text in generator_strings():
            roundtrip("lzss_lcp(coder=huff)", text)

    def test_threshold(self):
        data = b"ababababab xyxyxyxyxy " * 20
        sizes = {}
        for t in (2, 3, 6):
            c = compress(f"lzss_lcp(coder=bit, threshold={t})", data)
            assert decompress(c) == data
            sizes[t] = len(c)
        # known-format property: header present even with no factors
        c = compress("lzss_lcp(coder=bit, threshold=1000)", b"abcd")
        assert decompress(c) == b"abcd"

    def test_compresses_repetitive(self):
        data = open("/root/repo/SURVEY.md", "rb").read()[:30000]
        c = compress("lzss_lcp(coder=huff)", data)
        assert len(c) < 0.65 * len(data)
        assert decompress(c) == data
