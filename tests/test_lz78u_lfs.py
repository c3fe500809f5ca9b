"""lz78u + lfs compressor tests + suffix tree validation."""

from __future__ import annotations

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu.driver import compress, decompress


class TestSuffixTree:
    def test_structure_vs_bruteforce(self):
        from tudocomp_tpu.ds.suffix_array import naive_lcp, naive_suffix_array
        from tudocomp_tpu.ds.suffix_tree import SuffixTree

        rng = np.random.default_rng(0)
        cases = [b"banana\0", b"aaaa\0", b"abcabc\0", b"\0", b"a\0",
                 b"mississippi\0"]
        for n in (10, 50, 200):
            for sigma in (2, 4, 26):
                cases.append(
                    rng.integers(1, 1 + sigma, n).astype(np.uint8).tobytes() + b"\0"
                )
        for text in cases:
            sa = naive_suffix_array(text)
            lcp = naive_lcp(text, sa)
            st = SuffixTree(sa, lcp)
            n = len(text)
            for r in range(n):
                p = int(st.leaf_parent[r])
                want = 0
                if r > 0:
                    want = max(want, int(lcp[r]))
                if r + 1 < n:
                    want = max(want, int(lcp[r + 1]))
                assert st.sdepth[p] == want
                ds = [int(st.sdepth[v]) for v in st.leaf_path(r)]
                assert ds[0] == 0 and all(a < b for a, b in zip(ds, ds[1:]))


class TestLZ78U:
    @pytest.mark.parametrize(
        "opts", ["", "(coder=ascii)", "(threshold=1)", "(threshold=10)"]
    )
    def test_corpus(self, opts):
        for text in CORPUS:
            roundtrip(f"lz78u{opts}", text)

    def test_generators(self):
        for text in generator_strings():
            roundtrip("lz78u", text)

    def test_compresses(self):
        data = open("/root/repo/SURVEY.md", "rb").read()[:30000]
        c = compress("lz78u", data)
        assert decompress(c) == data
        assert len(c) < len(data)


class TestLFS:
    @pytest.mark.parametrize(
        "alg",
        [
            "lfs_comp",
            "lfs_comp(coding_strat=lfs_enocde_strat(lfs_lit_coder=bit,"
            " lfs_len_coder=delta))",
        ],
    )
    def test_corpus(self, alg):
        for text in CORPUS:
            roundtrip(alg, text)

    def test_generators(self):
        for text in generator_strings():
            roundtrip("lfs_comp", text)

    @pytest.mark.parametrize("strat", ["st", "bst", "sim_st", "st(min_lrf=3)"])
    def test_st_strategies(self, strat):
        for text in CORPUS:
            roundtrip(f"lfs_comp(computing_strat={strat})", text)

    @pytest.mark.parametrize("fn_name", ["esa_compute_rules", "st_compute_rules"])
    def test_rules_nonoverlap(self, fn_name):
        import tudocomp_tpu.compressors.lfs as lfs_mod
        from tudocomp_tpu.ds.textds import TextDS

        compute = getattr(lfs_mod, fn_name)
        rng = np.random.default_rng(1)
        for _ in range(10):
            n = int(rng.integers(10, 300))
            text = np.concatenate(
                [rng.integers(97, 101, n).astype(np.uint8), [0]]
            ).astype(np.uint8)
            ds = TextDS(text)
            dictionary, nts = compute(
                text, ds.require_sa(), ds.require_lcp()
            )
            # substituted regions must not overlap and must match their rule
            covered = np.zeros(len(text), bool)
            for pos, sym, length in nts:
                assert not covered[pos : pos + length].any()
                covered[pos : pos + length] = True
                off, ln = dictionary[sym]
                assert ln == length
                assert (text[pos : pos + length] == text[off : off + ln]).all()


def test_lfs2bst_distinct_backend():
    """lfs2bst uses the Ukkonen BinarySuffixTree (LFS2BSTCompressor.hpp),
    not an alias of lfs2: roundtrips hold and tie-breaking may differ."""
    from tudocomp_tpu.driver import compress, decompress

    data = b"abcabc abcabc xyxyxyxy abcabc xyxyxyxy" * 3
    c1 = compress("lfs2", data)
    c2 = compress("lfs2bst", data)
    assert decompress(c1) == data
    assert decompress(c2) == data


def test_binary_suffix_tree_structure():
    import numpy as np

    from tudocomp_tpu.ds.binary_suffix_tree import BinarySuffixTree

    text = np.frombuffer(b"banana\0", np.uint8)
    st = BinarySuffixTree(text)
    # every suffix reachable as a leaf exactly once
    seen = []

    def walk(v, depth):
        c = st.get_first_child(v)
        if c == 0 and v != 0:
            seen.append(st.get_suffix(v))
            return
        while c:
            walk(c, depth + st.get_edge_length(c))
            c = st.get_next_sibling(c)

    walk(0, 0)
    assert sorted(seen) == list(range(7))


def test_naiv_st_matches_binary_st_leaf_set():
    """NaivST (per-suffix insertion) and the Ukkonen BST agree on the
    suffix set and on substring-occurrence structure."""
    import numpy as np

    from tudocomp_tpu.ds.naiv_st import NaivST

    for text in (b"banana\0", b"mississippi\0", b"aaaa\0", b"ab\0"):
        t = np.frombuffer(text, np.uint8)
        st = NaivST(t)
        leaves = []

        def walk(v):
            ch = st.child_list(v)
            if not ch and v != 0:
                leaves.append(st.get_suffix(v))
                return
            for c in ch:
                walk(c)

        walk(0)
        assert sorted(leaves) == list(range(len(t))), text
        # string depth of a leaf == suffix length
        for v in range(1, st.get_tree_size()):
            if not st.children[v]:
                assert st.string_depth(v) == len(t) - st.get_suffix(v)
