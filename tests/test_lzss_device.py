"""Device (JAX) lzss_lcp factorization vs the native/python reference."""

import numpy as np
import pytest

from tudocomp_tpu.ds.textds import TextDS
from tudocomp_tpu.ops.lzss_jax import (
    ansv_minlcp,
    greedy_visited,
    lzss_lcp_factorize_device,
)
from tudocomp_tpu.compressors.lzss_lcp import lcp_factorize

from .util import CORPUS, generator_strings


def _textds(data: bytes):
    arr = np.frombuffer(data + b"\x00", np.uint8)
    ds = TextDS(arr)
    return ds.require_sa(), ds.require_isa(), ds.require_lcp()


def _ansv_ref(sa, lcp):
    """Monotone-stack reference for psv/nsv with min lcp."""
    n = len(sa)
    psv_src = np.full(n, -1, np.int64)
    psv_lcp = np.zeros(n, np.int64)
    st = []
    for j in range(n):
        m = int(lcp[j])
        while st and sa[st[-1][0]] > sa[j]:
            m = min(m, st[-1][1])
            st.pop()
        if st:
            psv_src[j] = sa[st[-1][0]]
            psv_lcp[j] = m
        st.append((j, m))
    nsv_src = np.full(n, -1, np.int64)
    nsv_lcp = np.zeros(n, np.int64)
    st = []
    for j in range(n - 1, -1, -1):
        m = int(lcp[j + 1]) if j + 1 < n else 0
        run = 1 << 62
        while st and sa[st[-1][0]] > sa[j]:
            run = min(run, st[-1][1])
            st.pop()
        if st:
            nsv_src[j] = sa[st[-1][0]]
            nsv_lcp[j] = min(m, run)
        st.append((j, min(m, run)))
    return psv_src, psv_lcp, nsv_src, nsv_lcp


@pytest.mark.parametrize("data", CORPUS[1:], ids=lambda d: repr(d[:12]))
def test_ansv_matches_stack(data):
    if not data:
        return
    sa, isa, lcp = _textds(data)
    got = [np.asarray(x) for x in ansv_minlcp(sa, lcp)]
    want = _ansv_ref(sa, lcp)
    for g, w, name in zip(got, want, ["psv_src", "psv_lcp", "nsv_src", "nsv_lcp"]):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_greedy_visited_matches_walk():
    rng = np.random.default_rng(7)
    for n in [1, 2, 3, 17, 256, 1000]:
        step = rng.integers(1, 9, n).astype(np.int32)
        import jax.numpy as jnp

        v = np.asarray(greedy_visited(jnp.asarray(step)))
        want = np.zeros(n, bool)
        i = 0
        while i < n:
            want[i] = True
            i += step[i]
        np.testing.assert_array_equal(v, want, err_msg=f"n={n}")


@pytest.mark.parametrize(
    "data", CORPUS[1:] + generator_strings()[:4], ids=lambda d: repr(d[:12])
)
@pytest.mark.parametrize("threshold", [2, 3])
def test_device_factorize_matches_host(data, threshold):
    if not data:
        return
    sa, isa, lcp = _textds(data)
    pos, src, ln = lzss_lcp_factorize_device(sa, isa, lcp, threshold)
    want = lcp_factorize(sa, isa, lcp, threshold)
    np.testing.assert_array_equal(pos, want.pos)
    np.testing.assert_array_equal(src, want.src)
    np.testing.assert_array_equal(ln, want.len)
