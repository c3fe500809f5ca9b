"""Bit IO format tests: exact byte-level assertions against the reference
conventions (BitOStream.hpp:53-64 EOF convention, MSB-first order, universal
codes)."""

import numpy as np
import pytest

from tudocomp_tpu.io.bitio import (
    BitReader,
    BitWriter,
    bits_for,
    bits_for_arr,
    valid_bit_count,
)


def test_bits_for():
    assert bits_for(0) == 1
    assert bits_for(1) == 1
    assert bits_for(2) == 2
    assert bits_for(3) == 2
    assert bits_for(4) == 3
    assert list(bits_for_arr([0, 1, 2, 3, 4, 255, 256])) == [1, 1, 2, 2, 3, 8, 9]


def test_empty_stream_is_single_zero_byte():
    w = BitWriter()
    assert w.getvalue() == b"\x00"
    r = BitReader(b"\x00")
    assert r.eof()


def test_final_byte_convention_small():
    # 3 bits "101" -> byte 1010_0000 | 3 = 0xA3
    w = BitWriter()
    w.write_bit(1)
    w.write_bit(0)
    w.write_bit(1)
    assert w.getvalue() == bytes([0b10100000 | 3])


def test_final_byte_convention_six_bits():
    # 6 bits -> partial byte flushed, extra marker byte 6
    w = BitWriter()
    for b in (1, 1, 1, 1, 1, 1):
        w.write_bit(b)
    assert w.getvalue() == bytes([0b11111100, 6])


def test_final_byte_convention_full_byte():
    w = BitWriter()
    w.write_int(0xAB, 8)
    assert w.getvalue() == bytes([0xAB, 0])


def test_valid_bit_count_roundtrip():
    for nbits in range(0, 40):
        w = BitWriter()
        for i in range(nbits):
            w.write_bit(i % 2)
        data = w.getvalue()
        assert valid_bit_count(data) == nbits, nbits
        r = BitReader(data)
        got = []
        while not r.eof():
            got.append(r.read_bit())
        assert got == [i % 2 for i in range(nbits)]


def test_write_int_msb_first():
    w = BitWriter()
    w.write_int(0b1011, 4)
    w.write_int(0b0110, 4)
    assert w.getvalue() == bytes([0b10110110, 0])
    r = BitReader(bytes([0b10110110, 0]))
    assert r.read_int(4) == 0b1011
    assert r.read_int(4) == 0b0110


@pytest.mark.parametrize("v", [0, 1, 2, 3, 5, 7, 63, 64, 100, 12345])
def test_unary_roundtrip(v):
    w = BitWriter()
    w.write_unary(v)
    r = BitReader(w.getvalue())
    assert r.read_unary() == v


@pytest.mark.parametrize("v", [0, 1, 2, 3, 4, 10, 255, 256, 7777777])
def test_ternary_roundtrip(v):
    w = BitWriter()
    w.write_ternary(v)
    r = BitReader(w.getvalue())
    assert r.read_ternary() == v


@pytest.mark.parametrize("v", [0, 1, 2, 3, 100, 65535, 123456789])
def test_gamma_delta_roundtrip(v):
    w = BitWriter()
    w.write_elias_gamma(v)
    w.write_elias_delta(v)
    r = BitReader(w.getvalue())
    assert r.read_elias_gamma() == v
    assert r.read_elias_delta() == v


@pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**40])
def test_compressed_int_roundtrip(v):
    w = BitWriter()
    w.write_compressed_int(v)
    r = BitReader(w.getvalue())
    assert r.read_compressed_int() == v


def test_gamma_exact_bits():
    # gamma(3): bits_for(3)=2 -> unary(2)="001", then "11" -> 00111
    w = BitWriter()
    w.write_elias_gamma(3)
    assert w.getvalue() == bytes([0b00111000 | 5])


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    values = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    nbits = rng.integers(1, 33, size=1000)
    w1 = BitWriter()
    for v, b in zip(values, nbits):
        w1.write_int(int(v) & ((1 << int(b)) - 1), int(b))
    w2 = BitWriter()
    w2.write_ints(values, nbits)
    assert w1.getvalue() == w2.getvalue()

    r = BitReader(w2.getvalue())
    # scalar read-back
    for v, b in zip(values, nbits):
        assert r.read_int(int(b)) == int(v) & ((1 << int(b)) - 1)


def test_vectorized_gamma_delta():
    values = [1, 2, 3, 100, 65535, 1, 7]
    w1 = BitWriter()
    for v in values:
        w1.write_elias_gamma(v)
    w2 = BitWriter()
    w2.write_elias_gammas(values)
    assert w1.getvalue() == w2.getvalue()

    w1 = BitWriter()
    for v in values:
        w1.write_elias_delta(v)
    w2 = BitWriter()
    w2.write_elias_deltas(values)
    assert w1.getvalue() == w2.getvalue()


def test_read_ints_vectorized():
    w = BitWriter()
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    for v in vals:
        w.write_int(v, 4)
    r = BitReader(w.getvalue())
    assert list(r.read_ints(8, 4)) == vals
