"""lcpcomp tests (mirror of reference lcpcomp matrix coverage)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import native
from tudocomp_tpu.driver import compress, decompress


@pytest.mark.parametrize("coder", ["bit", "ascii", "huff"])
def test_corpus(coder):
    for text in CORPUS:
        roundtrip(f"lcpcomp(coder={coder})", text)


def test_generators():
    for text in generator_strings():
        roundtrip("lcpcomp(coder=huff)", text)


@pytest.mark.parametrize("comp", ["arrays", "heap", "max_lcp", "plcppeaks"])
@pytest.mark.parametrize(
    "dec", ["scan", "compact", "QueueListBuffer", "MultimapListBuffer"]
)
def test_strategy_matrix(comp, dec):
    from tests.util import CORPUS

    for t in CORPUS:
        c = compress(f"lcpcomp(coder=huff, comp={comp}, dec={dec})", t)
        assert decompress(c) == t, (comp, dec, t[:40])


def test_strategy_cross_impl():
    import tudocomp_tpu.compressors.lcpcomp as L
    from tudocomp_tpu.ds.textds import TextDS

    if native.get_lib() is None:
        pytest.skip("no native lib")
    orig = native.get_lib
    rng = np.random.default_rng(9)
    try:
        for _ in range(15):
            n = int(rng.integers(2, 300))
            text = np.concatenate(
                [rng.integers(97, 101, n).astype(np.uint8), [0]]
            ).astype(np.uint8)
            ds = TextDS(text)
            sa, isa = ds.require_sa(), ds.require_isa()
            lcp, plcp = ds.require_lcp(), ds.require_plcp()
            for fn, arr in (
                (L.maxlcp_factorize, lcp),
                (L.plcppeaks_factorize, plcp),
            ):
                a = fn(sa, isa, arr, 3)
                native.get_lib = lambda: None
                b = fn(sa, isa, arr, 3)
                native.get_lib = orig
                assert (a.pos == b.pos).all()
                assert (a.src == b.src).all()
                assert (a.len == b.len).all()
    finally:
        native.get_lib = orig


@pytest.mark.parametrize(
    "opts",
    ["flatten=0", "threshold=3", "threshold=22", "dec=scan(scans=0)", "dec=scan(scans=2)",
     "dec=MultimapListBuffer(lazy=1)", "dec=MultimapListBuffer(lazy=3)"],
)
def test_options(opts):
    data = b"how much wood would a woodchuck chuck if a woodchuck could chuck wood " * 10
    c = compress(f"lcpcomp(coder=bit,{opts})", data)
    assert decompress(c) == data


def test_forward_references_decode():
    # lcpcomp factors may reference positions decoded later; the scan
    # decoder resolves them (pathological: highly repetitive input)
    data = (b"ab" * 500) + (b"xyz" * 300) + (b"ab" * 500)
    for scans in (0, 1, 6):
        c = compress(f"lcpcomp(coder=bit,dec=scan(scans={scans}))", data)
        assert decompress(c) == data


def test_native_python_equal():
    import tudocomp_tpu.compressors.lcpcomp as L
    from tudocomp_tpu.ds.textds import TextDS

    if native.get_lib() is None:
        pytest.skip("no native lib")
    orig = native.get_lib
    rng = np.random.default_rng(6)
    try:
        for _ in range(30):
            n = int(rng.integers(2, 200))
            text = np.concatenate(
                [rng.integers(1, 5, n).astype(np.uint8), [0]]
            ).astype(np.uint8)
            ds = TextDS(text)
            sa, isa, lcp = ds.require_sa(), ds.require_isa(), ds.require_lcp()
            fn = L.arrays_factorize(sa, isa, lcp, 5)
            native.get_lib = lambda: None
            fp = L.arrays_factorize(sa, isa, lcp, 5)
            native.get_lib = orig
            assert len(fn) == len(fp)
            assert (fn.pos == fp.pos).all()
            assert (fn.src == fp.src).all()
            assert (fn.len == fp.len).all()
    finally:
        native.get_lib = orig


def test_ratio_beats_lzss_lcp_on_repetitive():
    data = open("/root/repo/SURVEY.md", "rb").read()[:40000]
    c_lcp = compress("lcpcomp(coder=huff)", data)
    assert decompress(c_lcp) == data
    assert len(c_lcp) < 0.55 * len(data)
