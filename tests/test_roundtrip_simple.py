"""Roundtrip tests for the streaming slice: noop, rle, mtf, encode(*), chains."""

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import register_all
from tudocomp_tpu.compressors.simple import mtf_decode, mtf_encode, rle_decode, rle_encode

register_all()

SIMPLE_IDS = [
    "noop",
    "rle",
    "rle(offset=1)",
    "mtf",
    "encode(coder=bit)",
    "encode(coder=ascii)",
    "encode(coder=gamma)",
    "encode(coder=delta)",
    "encode(coder=ternary)",
    "rle:mtf",
    "mtf:rle:encode(bit)",
]


@pytest.mark.parametrize("algo", SIMPLE_IDS)
@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_corpus_roundtrip(algo, idx):
    roundtrip(algo, CORPUS[idx])


@pytest.mark.parametrize("algo", ["rle", "mtf", "encode(coder=gamma)"])
def test_generator_roundtrip(algo):
    for text in generator_strings():
        roundtrip(algo, text)


def test_rle_exact_format():
    # "aaa" -> 'a' 'a' vbyte(1): run of 3 -> char twice + vbyte(3-2)
    assert rle_encode(np.frombuffer(b"aaa", np.uint8)).tobytes() == b"aa\x01"
    assert rle_encode(np.frombuffer(b"aa", np.uint8)).tobytes() == b"aa\x00"
    assert rle_encode(np.frombuffer(b"ab", np.uint8)).tobytes() == b"ab"
    assert rle_decode(np.frombuffer(b"aa\x01", np.uint8)).tobytes() == b"aaa"


def test_mtf_exact():
    # 'banana': b=98 -> 98; a=97 -> 98 (b moved to front); n=110 -> 110;
    # a -> 2 (n,b ahead? table: [n,a,b,...] a at idx 1? let's simulate)
    data = np.frombuffer(b"banana", np.uint8)
    enc = mtf_encode(data)
    table = list(range(256))
    expected = []
    for c in data:
        i = table.index(c)
        expected.append(i)
        table.pop(i)
        table.insert(0, c)
    assert list(enc) == expected
    assert mtf_decode(enc).tobytes() == b"banana"


def test_mtf_large_random():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=100000, dtype=np.uint8)
    enc = mtf_encode(data)
    assert mtf_decode(enc).tobytes() == data.tobytes()


def test_rle_large_random():
    rng = np.random.default_rng(2)
    # runs-heavy data
    data = np.repeat(
        rng.integers(0, 8, size=5000, dtype=np.uint8),
        rng.integers(1, 20, size=5000),
    )
    enc = rle_encode(data)
    assert rle_decode(enc).tobytes() == data.tobytes()


def test_header_format():
    from tudocomp_tpu import driver

    comp = driver.compress("rle", b"aaa")
    assert comp.startswith(b"rle%")


def test_blockwise_host_pool_parity_and_restricted_inner():
    """blockwise(<inner>) host path: process-pool output is byte-identical
    to sequential, and restriction-needing inners (bwt's sentinel) are
    escaped per block on both sides."""
    import os

    import numpy as np

    from tudocomp_tpu.driver import compress, decompress

    rng = np.random.default_rng(0)
    data = (b"pool parity " * 3000) + bytes(rng.integers(1, 255, 9000))
    c = compress("blockwise(bwt, bs=4096)", data)
    assert decompress(c) == data
    os.environ["TDC_BLOCKWISE_PROCS"] = "0"
    try:
        c_seq = compress("blockwise(rle:mtf, bs=4096)", data)
    finally:
        del os.environ["TDC_BLOCKWISE_PROCS"]
    c_par = compress("blockwise(rle:mtf, bs=4096)", data)
    assert c_par == c_seq
    assert decompress(c_par) == data
