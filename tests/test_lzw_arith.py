"""LZW compressor + arithmetic coder tests."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import native
from tudocomp_tpu.driver import compress, decompress


class TestLZW:
    @pytest.mark.parametrize("coder", ["bit", "ascii", "gamma", "delta", "ternary"])
    def test_corpus(self, coder):
        for text in CORPUS:
            roundtrip(f"lzw(coder={coder})", text)

    def test_default_and_generators(self):
        for text in generator_strings():
            roundtrip("lzw", text)

    def test_self_reference_case(self):
        # k == dict.size() during decode (lzw/LZWDecoding.hpp:72-76)
        roundtrip("lzw", b"aaaaaaaaaaaaaaaaaa")
        roundtrip("lzw", b"abababababab")

    def test_cross_impl(self):
        from tudocomp_tpu.compressors.lzw import lzw_expand, lzw_parse

        if native.get_lib() is None:
            pytest.skip("no native lib")
        rng = np.random.default_rng(1)
        orig = native.get_lib
        try:
            for _ in range(20):
                data = rng.integers(97, 103, int(rng.integers(0, 500))).astype(
                    np.uint8
                )
                pn = lzw_parse(data)
                native.get_lib = lambda: None
                pp = lzw_parse(data)
                ep = lzw_expand(pn)
                native.get_lib = orig
                assert (pn == pp).all()
                assert ep == data.tobytes()
        finally:
            native.get_lib = orig


class TestArithmetic:
    def test_corpus(self):
        for text in CORPUS:
            roundtrip("encode(arithmetic)", text)

    def test_cross_impl_bytes(self):
        if native.get_lib() is None:
            pytest.skip("no native lib")
        orig = native.get_lib
        rng = np.random.default_rng(2)
        try:
            for _ in range(10):
                data = bytes(
                    rng.zipf(1.6, int(rng.integers(1, 2000))).clip(0, 255).astype(np.uint8)
                )
                cn = compress("encode(arithmetic)", data)
                native.get_lib = lambda: None
                cp = compress("encode(arithmetic)", data)
                dp = decompress(cn)
                native.get_lib = orig
                assert cn == cp
                assert dp == data
        finally:
            native.get_lib = orig

    def test_full_alphabet(self):
        # 256 distinct symbols: u8 codebook-size wrap handled
        data = bytes(range(256)) * 2
        roundtrip("encode(arithmetic)", data)

    def test_in_chain(self):
        # consuming coders are excluded from interleaved formats like lzss
        # (Documentation.md:1190-1203); chains buffer between stages, so
        # arithmetic composes there
        roundtrip("bwt:mtf:encode(arithmetic)", b"abcabcabc bcabca abcabc" * 5)
