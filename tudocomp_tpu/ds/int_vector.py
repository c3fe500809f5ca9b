"""Bit-packed integer vectors and rank/select.

Capability mirror of the reference's container layer (§2.3 of SURVEY.md):
  IntVector        ds/IntVector.hpp — arbitrary-bit-width packed vector
                   with width()/shrink-to-fit style re-packing
  BitVector        IntVector with width 1
  Rank             ds/Rank.hpp:16 + ds/rank_64bit.hpp — 64-bit block +
                   superblock popcount ranks
  Select           ds/Select.hpp:20 — sampled select1/select0
Arrays are numpy-backed; packing uses vectorized shifts. The device twin
of packing is ops/bitpack.py.
"""

from __future__ import annotations

import numpy as np


def bits_for(n: int) -> int:
    n = int(n)
    return 1 if n == 0 else n.bit_length()


class IntVector:
    """Fixed-width bit-packed integer vector.

    Stores values in a packed uint64 word array, width bits each
    (LSB-first within the word stream, like ds/IntRepr.hpp's layout
    choice — layout is an internal detail here; serialization goes
    through BitWriter/bitpack which are MSB-first format-defining).
    """

    def __init__(self, values=None, width: int | None = None):
        if values is None:
            values = np.zeros(0, np.uint64)
        values = np.asarray(values, dtype=np.uint64)
        if width is None:
            width = bits_for(int(values.max())) if len(values) else 1
        assert 1 <= width <= 64
        self._width = int(width)
        self._n = len(values)
        self._words = self._pack(values, self._width)

    @staticmethod
    def _pack(values: np.ndarray, width: int) -> np.ndarray:
        n = len(values)
        total_bits = n * width
        nwords = (total_bits + 63) // 64
        words = np.zeros(nwords + 1, dtype=np.uint64)
        if n == 0:
            return words
        mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(2**64 - 1)
        v = values & mask
        bitpos = np.arange(n, dtype=np.uint64) * np.uint64(width)
        w0 = (bitpos >> np.uint64(6)).astype(np.int64)
        off = bitpos & np.uint64(63)
        lo = v << off
        np.bitwise_or.at(words, w0, lo)
        # high spill into the next word
        spill = off.astype(np.int64) + width > 64
        if spill.any():
            sh = np.uint64(64) - off[spill]
            np.bitwise_or.at(words, w0[spill] + 1, v[spill] >> sh)
        return words

    def __len__(self) -> int:
        return self._n

    @property
    def width(self) -> int:
        return self._width

    @property
    def bit_size(self) -> int:
        return self._n * self._width

    def to_array(self) -> np.ndarray:
        n, width = self._n, self._width
        if n == 0:
            return np.zeros(0, np.uint64)
        mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(2**64 - 1)
        bitpos = np.arange(n, dtype=np.uint64) * np.uint64(width)
        w0 = (bitpos >> np.uint64(6)).astype(np.int64)
        off = bitpos & np.uint64(63)
        lo = self._words[w0] >> off
        hi_sh = (np.uint64(64) - off) & np.uint64(63)
        hi = np.where(off > 0, self._words[w0 + 1] << hi_sh, np.uint64(0))
        return (lo | hi) & mask

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            width = self._width
            bitpos = int(i) * width
            w0, off = divmod(bitpos, 64)
            v = int(self._words[w0]) >> off
            if off + width > 64:
                v |= int(self._words[w0 + 1]) << (64 - off)
            return v & ((1 << width) - 1)
        return self.to_array()[i]

    def repack(self, width: int) -> "IntVector":
        """width(w) + shrink_to_fit re-pack (ds/IntVector.hpp)."""
        return IntVector(self.to_array(), width)


class BitVector(IntVector):
    def __init__(self, bits):
        bits = np.asarray(bits).astype(np.uint64) & np.uint64(1)
        super().__init__(bits, width=1)

    def to_bool(self) -> np.ndarray:
        return self.to_array().astype(bool)


class Rank:
    """Block/superblock rank over a bit array (ds/Rank.hpp:16).

    rank1(i) = number of 1 bits in positions [0, i] (inclusive, matching
    the reference's rank convention over Rank::rank1(end)).
    """

    SUPER = 512  # bits per superblock (8 x 64-bit blocks)

    def __init__(self, bits):
        if isinstance(bits, BitVector):
            bits = bits.to_bool()
        self.bits = np.asarray(bits, dtype=bool)
        n = len(self.bits)
        pad = (-n) % 64
        padded = np.concatenate([self.bits, np.zeros(pad, bool)])
        words = np.packbits(padded.reshape(-1, 8)[:, ::-1], axis=1)
        self._word_pop = (
            np.unpackbits(words, axis=1).sum(axis=1).reshape(-1, 8).sum(axis=1)
        )
        self._block_cum = np.concatenate(
            [[0], np.cumsum(self._word_pop)]
        )  # 64-bit block prefix sums
        self._cum = np.concatenate([[0], np.cumsum(self.bits)])

    def rank1(self, i: int) -> int:
        return int(self._cum[i + 1])

    def rank0(self, i: int) -> int:
        return (i + 1) - self.rank1(i)

    def rank1_arr(self, idx) -> np.ndarray:
        return self._cum[np.asarray(idx, dtype=np.int64) + 1]


class Select:
    """Sampled select over a bit array (ds/Select.hpp:20).

    select1(k) = position of the k-th 1 bit (1-based, like the reference).
    """

    def __init__(self, bits):
        if isinstance(bits, BitVector):
            bits = bits.to_bool()
        bits = np.asarray(bits, dtype=bool)
        self._ones = np.flatnonzero(bits)
        self._zeros = np.flatnonzero(~bits)

    def select1(self, k: int) -> int:
        return int(self._ones[k - 1])

    def select0(self, k: int) -> int:
        return int(self._zeros[k - 1])

    def select1_arr(self, ks) -> np.ndarray:
        return self._ones[np.asarray(ks, dtype=np.int64) - 1]
