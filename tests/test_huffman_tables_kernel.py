"""Consolidated Huffman-tables Pallas kernel vs the XLA reference chain.

The kernel (ops/pallas_kernels.huffman_tables_pallas) fuses sort + Moffat
phases + canonical code assignment; it must agree exactly with
code_lengths_batch + canonical_codes_batch for every alphabet shape.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tudocomp_tpu.ops import huffman_jax as H
from tudocomp_tpu.ops.pallas_kernels import huffman_tables_pallas


def _cases():
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 5000, (16, 256)).astype(np.int32)
    sparse = np.zeros((8, 256), np.int32)
    sparse[np.arange(8)[:, None], rng.integers(0, 256, (8, 7))] = rng.integers(
        1, 100, (8, 7)
    )
    deg = np.zeros((4, 256), np.int32)
    deg[0, 65] = 10
    deg[2, 0] = 1
    deg[3, [1, 2]] = [5, 5]
    skew = np.ones((4, 256), np.int32)
    skew[:, 0] = 1 << 20
    return {"dense": dense, "sparse": sparse, "degenerate": deg, "skew": skew}


@pytest.mark.parametrize("name", ["dense", "sparse", "degenerate", "skew"])
def test_tables_kernel_parity(name):
    hists = _cases()[name]
    hj = jnp.asarray(hists)
    lengths, cw, numl, osym, sigma, longest = huffman_tables_pallas(
        hj, interpret=True
    )
    want_len = H.code_lengths_batch(hj)
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(want_len))
    wcw, wnuml, wosym, wsig, wlong = H.canonical_codes_batch(want_len)
    np.testing.assert_array_equal(np.asarray(sigma), np.asarray(wsig))
    np.testing.assert_array_equal(np.asarray(longest), np.asarray(wlong))
    np.testing.assert_array_equal(np.asarray(numl), np.asarray(wnuml))
    np.testing.assert_array_equal(np.asarray(osym), np.asarray(wosym))
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(wcw))
