"""Encoder/Decoder bases with range-overload dispatch.

Mirror of include/tudocomp/Coder.hpp:14-147: the default `encode(v, Range)`
writes v-min in bits_for(max-min) bits; `encode(v, BitRange)` writes one bit.
Subclasses override per-range behavior. Vectorized `encode_array` /
`decode_array` variants are the TPU-native hot path: whole token streams are
encoded in one call.
"""

from __future__ import annotations

import numpy as np

from ..io.bitio import BitReader, BitWriter, bits_for
from ..meta import Algorithm, Env
from ..ranges import BitRange, Range


class Encoder(Algorithm):
    def __init__(self, env: Env, writer: BitWriter, literals):
        super().__init__(env)
        self.w = writer
        self.literals = literals

    def encode(self, v, r: Range) -> None:
        if isinstance(r, BitRange):
            self.w.write_bit(bool(v))
        else:
            self.w.write_int(int(v) - r.min, bits_for(r.delta))

    def encode_array(self, values, r: Range) -> None:
        """Vectorized encode of many values with the same range."""
        values = np.asarray(values, dtype=np.uint64)
        if isinstance(r, BitRange):
            self.w.write_ints(values, 1)
        else:
            self.w.write_ints(values - np.uint64(r.min), bits_for(r.delta))

    def finalize(self) -> None:
        """Called after the last encode (destructor analogue). Consuming
        coders (arithmetic/SLE) flush their buffers here."""


class Decoder(Algorithm):
    def __init__(self, env: Env, reader: BitReader):
        super().__init__(env)
        self.r = reader

    def eof(self) -> bool:
        return self.r.eof()

    def decode(self, r: Range) -> int:
        if isinstance(r, BitRange):
            return self.r.read_bit()
        return r.min + self.r.read_int(bits_for(r.delta))

    def decode_array(self, count: int, r: Range) -> np.ndarray:
        if isinstance(r, BitRange):
            return self.r.read_ints(count, 1)
        return self.r.read_ints(count, bits_for(r.delta)) + np.uint64(r.min)

    def literal_fixed_width(self) -> int | None:
        """Bits per literal_r symbol if fixed (enables bulk decode), else None."""
        return 8
