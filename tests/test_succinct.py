"""Succinct structure tests: IntVector, Rank/Select, SparseISA,
CompressedLCP (mirror of test/generic_int_vector_tests.cpp,
test/rank_select_tests.cpp coverage at the behavior level)."""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.ds.int_vector import BitVector, IntVector, Rank, Select
from tudocomp_tpu.ds.providers import CompressedLCP, SparseISA
from tudocomp_tpu.ds.suffix_array import (
    inverse_permutation,
    phi_from_sa,
    plcp_from_phi_numpy,
    suffix_array_numpy,
)


def test_int_vector_widths():
    rng = np.random.default_rng(0)
    for w in (1, 3, 7, 8, 13, 31, 32, 33, 63, 64):
        vals = rng.integers(0, 1 << min(w, 63), 777).astype(np.uint64)
        iv = IntVector(vals, w)
        assert iv.width == w
        assert iv.bit_size == 777 * w
        assert (iv.to_array() == vals).all()
        assert iv[0] == vals[0] and iv[776] == vals[776]
        assert (iv.repack(64).to_array() == vals).all()


def test_bit_vector():
    bits = np.array([1, 0, 1, 1, 0, 0, 1])
    bv = BitVector(bits)
    assert (bv.to_bool() == bits.astype(bool)).all()


def test_rank_select():
    rng = np.random.default_rng(1)
    for density in (0.01, 0.5, 0.99):
        bits = rng.random(3000) < density
        if not bits.any():
            bits[0] = True
        r, s = Rank(bits), Select(bits)
        cum = np.cumsum(bits)
        idx = rng.integers(0, 3000, 50)
        assert (r.rank1_arr(idx) == cum[idx]).all()
        ones = np.flatnonzero(bits)
        ks = rng.integers(1, len(ones) + 1, 20)
        assert (s.select1_arr(ks) == ones[ks - 1]).all()
        zeros = np.flatnonzero(~bits)
        if len(zeros):
            assert s.select0(1) == zeros[0]


def test_sparse_isa():
    rng = np.random.default_rng(2)
    for t in (2, 4, 16, 64):
        n = int(rng.integers(1, 300))
        text = np.concatenate([rng.integers(1, 5, n).astype(np.uint8), [0]])
        sa = suffix_array_numpy(text)
        si = SparseISA(sa, t=t)
        isa = inverse_permutation(sa)
        for i in rng.integers(0, len(sa), 30):
            assert si.isa(int(i)) == isa[i]
        assert (si.to_array() == isa).all()


def test_compressed_lcp():
    rng = np.random.default_rng(3)
    for _ in range(10):
        n = int(rng.integers(2, 300))
        text = np.concatenate([rng.integers(1, 4, n).astype(np.uint8), [0]])
        sa = suffix_array_numpy(text)
        plcp = plcp_from_phi_numpy(text, phi_from_sa(sa))
        cl = CompressedLCP(plcp, sa)
        assert (cl.plcp_array() == plcp).all()
        assert cl.lcp(0) == 0
        for i in rng.integers(1, len(sa), 10):
            assert cl.lcp(int(i)) == plcp[sa[i]]


def test_sparse_isa_vectorized_queries():
    rng = np.random.default_rng(4)
    for t in (1, 2, 3, 16, 64):
        n = int(rng.integers(1, 400))
        text = np.concatenate([rng.integers(1, 6, n).astype(np.uint8), [0]])
        sa = suffix_array_numpy(text)
        si = SparseISA(sa, t=t)
        isa = inverse_permutation(sa)
        assert (si.to_array_via_queries() == isa).all(), t


def test_textds_provider_axis_cli():
    """The textds DSL axis routes through the succinct providers and the
    payload is provider-invariant (registry_config.py:72-75 parity)."""
    from tudocomp_tpu.driver import compress, decompress

    data = b"how much wood would a woodchuck chuck" * 9
    base = compress("lzss_lcp(coder=huff)", data)
    for axis in (
        "textds(isa=sparse_isa)",
        "textds(isa=sparse_isa(t=1))",
        "textds(lcp=compressed_lcp)",
        "textds(lcp=compressed_lcp, isa=sparse_isa(t=2))",
        "textds(sa=divsufsort, phi=from_sa, plcp=from_phi)",
    ):
        c = compress(f"lzss_lcp(coder=huff, textds={axis})", data)
        assert decompress(c) == data, axis
        # identical payload bytes after the differing <id>% headers
        assert c[c.index(b"%"):] == base[base.index(b"%"):], axis
    for algo in (
        "bwt(textds=textds(isa=sparse_isa))",
        "lcpcomp(coder=huff, textds=textds(lcp=compressed_lcp))",
    ):
        c = compress(algo, data)
        assert decompress(c) == data, algo


def test_textds_axis_in_list_docs():
    from tudocomp_tpu.registry import REGISTRY

    assert "textds" in REGISTRY.types()
    assert REGISTRY.names("isa") == ["from_sa", "sparse_isa"]
    assert REGISTRY.names("lcp") == ["compressed_lcp", "from_phi"]
    doc = REGISTRY.generate_doc_string("textds")
    assert "sa: sa = divsufsort" in doc
