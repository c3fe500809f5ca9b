"""Huffman coder tests: table construction, exact serialization pieces,
roundtrips, degenerate alphabets."""

import numpy as np
import pytest

from tests.util import CORPUS, generator_strings, roundtrip
from tudocomp_tpu import register_all
from tudocomp_tpu.coders.huffman import HuffmanTable, gen_codelengths, gen_first_codes
from tudocomp_tpu.io.bitio import BitReader, BitWriter

register_all()


def test_gen_codelengths_basic():
    # classic example: counts 1,1,2,4 -> lengths 3,3,2,1
    lengths = gen_codelengths(np.array([1, 1, 2, 4]))
    assert sorted(lengths) == [1, 2, 3, 3]
    # total cost is optimal regardless of tie-breaking
    assert int((lengths * np.array([1, 1, 2, 4])).sum()) == 1 * 3 + 1 * 3 + 2 * 2 + 4


def test_gen_codelengths_uniform():
    lengths = gen_codelengths(np.array([5, 5, 5, 5]))
    assert list(lengths) == [2, 2, 2, 2]


def test_first_codes():
    # from the MG scheme: lengths [1,2,2] -> numl=[1,2]; firstcode[1]=0,
    # firstcode[0]=(0+2)/2=1
    fc = gen_first_codes(np.array([1, 2]), 2)
    assert list(fc) == [1, 0]


def test_table_roundtrip_serialization():
    counts = np.bincount(np.frombuffer(b"abracadabra", np.uint8), minlength=256)
    t = HuffmanTable.from_counts(counts)
    w = BitWriter()
    from tudocomp_tpu.coders.huffman import read_table, write_table

    write_table(w, t)
    r = BitReader(w.getvalue())
    t2 = read_table(r)
    assert t2.longest == t.longest
    assert list(t2.numl) == list(t.numl)
    assert list(t2.ordered_map_from_effective) == list(t.ordered_map_from_effective)
    assert list(t2.codewords) == list(t.codewords)


def test_codewords_are_prefix_free():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    t = HuffmanTable.from_counts(np.bincount(data, minlength=256))
    codes = [
        format(int(c), f"0{int(l)}b")
        for c, l in zip(t.codewords, t.ordered_codelengths)
    ]
    assert len(set(codes)) == len(codes)
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a), (a, b)


@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_encode_huff_roundtrip(idx):
    roundtrip("encode(coder=huff)", CORPUS[idx])


def test_encode_huff_generators():
    for text in generator_strings():
        roundtrip("encode(coder=huff)", text)


def test_degenerate_single_char():
    comp = roundtrip("encode(coder=huff)", b"aaaaaaaa")
    # header "encode(coder=huff)%" + flag bit 0 + raw bytes
    payload = comp.split(b"%", 1)[1]
    r = BitReader(payload)
    assert r.read_bit() == 0


def test_huff_smaller_than_bit_on_skewed():
    text = b"a" * 1000 + b"b" * 10 + b"c"
    from tudocomp_tpu import driver

    huff = driver.compress("encode(coder=huff)", text)
    bit = driver.compress("encode(coder=bit)", text)
    assert len(huff) < len(bit)


def test_huff_large():
    rng = np.random.default_rng(7)
    # zipf-ish distribution
    data = (rng.zipf(1.5, size=200000) % 64).astype(np.uint8)
    roundtrip("encode(coder=huff)", data.tobytes())
