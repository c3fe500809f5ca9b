"""ESP + RePair grammar compressor tests (mirror of test/esp_tests.cpp
coverage goals at the roundtrip level plus cross-impl equality)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import native
from tudocomp_tpu.driver import compress, decompress


class TestEsp:
    def test_corpus(self):
        for text in CORPUS:
            roundtrip("esp", text)

    def test_generators(self):
        for text in generator_strings():
            roundtrip("esp", text)

    def test_round_cross_impl(self):
        from tudocomp_tpu.compressors.esp import esp_round, esp_round_python

        if native.get_lib() is None:
            pytest.skip("no native lib")
        rng = np.random.default_rng(0)
        for t in range(40):
            n = int(rng.integers(0, 300))
            sigma = int(rng.choice([2, 3, 26, 200]))
            s = rng.integers(0, sigma, n).astype(np.uint32)
            a, b, c = esp_round(s, 256)
            ap, bp, cp = esp_round_python(s, 256)
            assert (a == ap).all() and (b == bp).all() and (c == cp).all(), t

    def test_derivation_consistency(self):
        # grammar derives the exact input (generate + derive without coder)
        from tudocomp_tpu.compressors.esp import derive_text, generate_grammar

        for text in (b"abcabcabc", b"aaaa", b"xy" * 100):
            rules, root, empty = generate_grammar(np.frombuffer(text, np.uint8))
            assert not empty
            assert derive_text(rules, root) == text

    D_CODINGS = [
        "plain",
        "huffman",
        "diff",
        "wavelet_tree",
        "range_fit",
        "range_fit(wt=true)",
        "range_fit(threshold=25, wt=true, zero_min=true)",
        "succinct",
        "succinct(subseq=optimal, dx_coder=plain)",
        "succinct(subseq=greedy, dx_coder=huffman)",
        "succinct(subseq=greedy, dx_coder=wavelet_tree)",
    ]

    @pytest.mark.parametrize("d", D_CODINGS)
    def test_d_coding_axis(self, d):
        for text in CORPUS:
            roundtrip(f"esp(slp_coder=sorted(d_coding={d}))", text)
        # one bigger mixed input per coding
        rng = np.random.default_rng(7)
        big = rng.integers(97, 105, 4000, dtype=np.uint8).tobytes() + b"ab" * 500
        roundtrip(f"esp(slp_coder=sorted(d_coding={d}))", big)

    def test_unary_diff_codec(self):
        from tudocomp_tpu.compressors.esp_dcoding import (
            decode_unary_diff,
            encode_unary_diff,
        )
        from tudocomp_tpu.io.bitio import BitReader, BitWriter

        rng = np.random.default_rng(3)
        cases = [
            np.zeros(0, np.int64),
            np.zeros(10, np.int64),
            np.arange(50),
            np.array([5] * 100),
            rng.integers(0, 1000, 200),
            np.sort(rng.integers(0, 1000, 200)),
        ]
        for sign in (True, False):
            for v in cases:
                if not sign:
                    v = np.sort(v)
                w = BitWriter()
                encode_unary_diff(w, v, 12, 12, sign)
                r = BitReader(w.getvalue())
                got = decode_unary_diff(r, len(v), 12, 12, sign)
                assert (got == v).all(), (sign, v[:10], got[:10])

    def test_monotone_decomposition_invariants(self):
        from tudocomp_tpu.compressors.esp_dcoding import (
            SubSeqGreedy,
            SubSeqOptimal,
        )

        rng = np.random.default_rng(5)
        for cls in (SubSeqOptimal, SubSeqGreedy):
            strat = cls.__new__(cls)  # no env needed
            for n in (1, 2, 17, 100):
                sis = rng.permutation(n)
                Dpi, b = strat.create_dpi_and_b(sis)
                assert len(Dpi) == n and Dpi.max() == len(b) - 1
                # each subsequence is strictly monotone in sis, direction b
                for s in range(len(b)):
                    ys = sis[Dpi == s]
                    if len(ys) > 1:
                        d = np.diff(ys.astype(np.int64))
                        if b[s] == 0:
                            assert (d > 0).all()
                        else:
                            assert (d < 0).all()

    def test_landmark_properties(self):
        # every round's blocks are sized 2..3 and cover the string: implied
        # by esp_round not raising and by derivation; explicit length check
        from tudocomp_tpu.compressors.esp import esp_round

        rng = np.random.default_rng(1)
        s = rng.integers(0, 26, 1000).astype(np.uint32)
        nxt, rl, rr = esp_round(s, 256)
        assert len(nxt) >= len(s) // 3
        assert len(nxt) <= len(s) // 2 + 1


class TestRePair:
    @pytest.mark.parametrize("coder", ["bit", "huff", "gamma"])
    def test_corpus(self, coder):
        for text in CORPUS:
            roundtrip(f"repair(coder={coder})", text)

    def test_max_rules(self):
        data = b"abcabcabcabc" * 20
        for mr in (0, 1, 5):
            c = compress(f"repair(max_rules={mr})", data)
            assert decompress(c) == data

    def test_cross_impl(self):
        from tudocomp_tpu.compressors.repair import repair_build, repair_expand

        if native.get_lib() is None:
            pytest.skip("no native lib")
        orig = native.get_lib
        rng = np.random.default_rng(2)
        try:
            for _ in range(20):
                data = rng.integers(97, 101, int(rng.integers(0, 300))).astype(
                    np.uint8
                )
                rn = repair_build(data, 0)
                native.get_lib = lambda: None
                rp = repair_build(data, 0)
                ep = repair_expand(*rn)
                native.get_lib = orig
                en = repair_expand(*rn)
                for x, y in zip(rn, rp):
                    assert (x == y).all()
                assert ep == en == data.tobytes()
        finally:
            native.get_lib = orig


def test_esp_corrupt_container_raises_cleanly():
    """Corrupt ESP streams must raise, not crash: the native derive/decode
    paths carry explicit bounds guards (review finding, tdc_native.cpp
    tdc_esp_derive / tdc_canonical_decode_idx)."""
    import pytest

    from tudocomp_tpu.driver import compress, decompress

    data = b"corrupt me please " * 40
    for algo in ("esp", "esp(slp_coder=sorted(d_coding=huffman))"):
        c = bytearray(compress(algo, data))
        for flip in (len(c) // 2, len(c) - 2, len(c) // 3):
            bad = bytes(c[:flip]) + bytes([c[flip] ^ 0xFF]) + bytes(c[flip + 1:])
            try:
                out = decompress(bad)
                assert isinstance(out, bytes)  # wrong bytes are acceptable
            except (ValueError, AssertionError, IndexError, KeyError):
                pass  # clean python exception, never a native crash


def test_statphase_thread_isolation():
    """Worker-thread phases must not corrupt the main thread's tree
    (review finding: the phase cursor is thread-local)."""
    import concurrent.futures as cf

    from tudocomp_tpu.stats.phase import StatPhase

    with StatPhase("root") as root:
        with StatPhase("main-child"):
            def worker(i):
                with StatPhase(f"thread-{i}"):
                    with StatPhase("inner"):
                        pass
                return StatPhase.current()  # must be None in this thread

            with cf.ThreadPoolExecutor(max_workers=4) as ex:
                residues = list(ex.map(worker, range(8)))
        assert all(r is None for r in residues)
        assert StatPhase.current() is root
    d = root.to_dict()
    assert [c["title"] for c in d["sub"]] == ["main-child"]
    assert d["sub"][0]["sub"] == []


def test_esp_derive_cycle_raises():
    """A cyclic rule graph (rule 0 -> (256, x), i.e. self-reference) must
    raise instead of hanging with unbounded memory growth — both the
    native tdc_esp_derive walk (-3 sentinel) and the python mirror
    (advisor finding r4: the -2 bound check only caught out-of-range ids)."""
    import numpy as np
    import pytest

    from tudocomp_tpu import native
    from tudocomp_tpu.compressors.esp import derive_text

    # rule 256 -> (256, 65): direct self-cycle
    rules = np.array([[256, 65]], dtype=np.int64)
    with pytest.raises(ValueError, match="cyclic"):
        derive_text(rules, 256)

    # two-rule cycle 256 -> (257, 65), 257 -> (256, 66)
    rules2 = np.array([[257, 65], [256, 66]], dtype=np.int64)
    with pytest.raises(ValueError, match="cyclic"):
        derive_text(rules2, 256)

    # python mirror (native lib absent) must behave identically
    orig = native.get_lib
    native.get_lib = lambda: None
    try:
        with pytest.raises(ValueError, match="cyclic"):
            derive_text(rules, 256)
        with pytest.raises(ValueError, match="cyclic"):
            derive_text(rules2, 256)
        # sanity: valid SLPs still derive identically in the mirror
        ok = np.array([[65, 66], [256, 67]], dtype=np.int64)
        assert derive_text(ok, 257) == b"ABC"
    finally:
        native.get_lib = orig
    assert derive_text(np.array([[65, 66], [256, 67]], np.int64), 257) == b"ABC"
