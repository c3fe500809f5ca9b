"""Device (JAX) ESP round / grammar parity vs the exact host reference.

The device round (ops/esp_jax.py) must be bit-identical to
esp_round_python (the tested mirror of the reference round,
EspContextImpl.hpp:14-165) wherever it does not signal fallback, and
esp_grammar_device must reproduce generate_grammar exactly (it re-runs
the host path when any round trips the adjust-window fallback, so its
result is *always* exact).
"""

import itertools
import os

import numpy as np
import pytest

from tudocomp_tpu.compressors.esp import (
    esp_round_python,
    generate_grammar,
)
from tudocomp_tpu.ops.esp_jax import esp_grammar_device, esp_round_device
from tudocomp_tpu.ops.esp_vec import esp_round_vec


def _ref(src, alphabet):
    return esp_round_python(np.asarray(src, np.uint32), alphabet)


def _assert_round_eq(ref, got):
    for r, g, nm in zip(ref, got, ("nxt", "rl", "rr")):
        assert np.array_equal(r, g), nm


@pytest.mark.parametrize("alphabet", [256, 7, 1 << 20])
def test_vec_round_exhaustive_binary(alphabet):
    for L in range(2, 10):
        for bits in itertools.product((0, 1), repeat=L):
            ref = _ref(bits, alphabet)
            got = esp_round_vec(np.asarray(bits, np.uint32), alphabet)
            _assert_round_eq(ref, got)


def test_vec_round_random():
    rng = np.random.default_rng(7)
    for trial in range(400):
        alphabet = int(rng.choice([2, 5, 7, 8, 9, 16, 17, 200, 256, 257, 5000]))
        L = int(rng.integers(2, 300))
        sigma = min(alphabet, int(rng.choice([2, 3, 4, 8, alphabet])))
        if trial % 3 == 0:
            s = rng.integers(0, sigma, L)
        elif trial % 3 == 1:
            s = np.repeat(rng.integers(0, sigma, L), rng.integers(1, 5, L))[:L]
            if len(s) < 2:
                continue
        else:
            s = rng.choice(np.unique(rng.integers(0, alphabet, sigma)), L)
        _assert_round_eq(_ref(s, alphabet), esp_round_vec(np.asarray(s, np.uint32), alphabet))


def test_device_round_small():
    fallbacks = 0
    for L in range(2, 9):
        for bits in itertools.product((0, 1), repeat=L):
            ref = _ref(bits, 256)
            got = esp_round_device(np.asarray(bits, np.uint32), 256)
            if got is None:
                fallbacks += 1
                continue
            _assert_round_eq(ref, got)
    # the window machinery must carry most of the load, not the fallback
    assert fallbacks < 60


def test_device_round_random():
    rng = np.random.default_rng(11)
    checked = 0
    for trial in range(120):
        alphabet = int(rng.choice([7, 9, 17, 256, 257, 5000]))
        L = int(rng.integers(2, 400))
        sigma = min(alphabet, int(rng.choice([2, 3, 4, 8, alphabet])))
        if trial % 2 == 0:
            s = rng.integers(0, sigma, L)
        else:
            s = np.repeat(rng.integers(0, sigma, L), rng.integers(1, 5, L))[:L]
            if len(s) < 2:
                continue
        got = esp_round_device(np.asarray(s, np.uint32), alphabet)
        if got is None:
            continue
        checked += 1
        _assert_round_eq(_ref(s, alphabet), got)
    assert checked > 40


def test_device_round_mississippi():
    s = np.frombuffer(b"mississippi" * 30, np.uint8).astype(np.uint32)
    got = esp_round_device(s, 256)
    if got is not None:
        _assert_round_eq(_ref(s, 256), got)


def _grammar_eq(data, threshold):
    ref = generate_grammar(np.frombuffer(data, np.uint8))
    got = esp_grammar_device(np.frombuffer(data, np.uint8), threshold=threshold)
    assert np.array_equal(ref[0], got[0])
    assert ref[1] == got[1] and ref[2] == got[2]


def test_grammar_device_english_like():
    rng = np.random.default_rng(3)
    words = [rng.integers(97, 123, rng.integers(2, 9)).astype(np.uint8) for _ in range(300)]
    text = b" ".join(words[i].tobytes() for i in rng.integers(0, len(words), 40000))
    _grammar_eq(text, threshold=8192)


def test_grammar_device_runs_and_unicode():
    rng = np.random.default_rng(5)
    runs = np.repeat(rng.integers(97, 103, 30000), rng.integers(1, 7, 30000)).astype(np.uint8)
    _grammar_eq(runs.tobytes(), threshold=8192)
    _grammar_eq("äöü εξαγωγή 字符串 ".encode("utf-8") * 2500, threshold=8192)


def test_grammar_device_tiny_inputs_delegate():
    for data in (b"", b"a", b"ab", b"aaa"):
        ref = generate_grammar(np.frombuffer(data, np.uint8))
        got = esp_grammar_device(np.frombuffer(data, np.uint8), threshold=1 << 15)
        assert np.array_equal(ref[0], got[0]) and ref[1:] == got[1:]


def test_slp_dep_sort_vectorized_parity():
    from tudocomp_tpu.compressors.esp import slp_dep_sort, slp_dep_sort_python

    rng = np.random.default_rng(9)
    for trial in range(25):
        n = int(rng.integers(4, 3000))
        if trial % 3 == 0:
            data = rng.integers(0, 256, n).astype(np.uint8)
        elif trial % 3 == 1:
            data = np.repeat(rng.integers(97, 101, n), rng.integers(1, 6, n)).astype(np.uint8)[:n]
        else:
            data = rng.integers(97, 105, n).astype(np.uint8)
        rules, root, empty = generate_grammar(data)
        if empty:
            continue
        a = slp_dep_sort_python(rules.copy(), root)
        b = slp_dep_sort(rules.copy(), root)
        assert np.array_equal(a[0], b[0]) and a[1] == b[1]
