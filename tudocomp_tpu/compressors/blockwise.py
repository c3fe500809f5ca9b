"""Blockwise (data-parallel) compressor wrapper (id "blockwise").

The CLI/DSL surface of the block-parallel runtime (SURVEY.md §2.11, the
new distributed dimension): the input is split into fixed-size blocks and
each block is compressed independently — on the device mesh for the
device-native inner pipelines (encode(huff) runs the jitted block-parallel
Huffman encoder over all local devices, with optional psum'd shared
tables), and on the host for any other inner compressor. Per-block streams
are framed in the deterministic TBK1 container (parallel/blocks.py), so
output bytes are identical for any device count.

    blockwise(inner, bs=262144, shared=false)
"""

from __future__ import annotations

import numpy as np

from ..base import Compressor
from ..io.inout import Input, Output
from ..meta import Meta
from ..stats.phase import StatPhase
from ..parallel.blocks import frame_streams, split_blocks, unframe_streams


def _device_available() -> bool:
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:
        return False


class BlockwiseCompressor(Compressor):
    @classmethod
    def meta(cls) -> Meta:
        m = Meta("compressor", "blockwise", "Block-parallel compression wrapper")
        m.option("inner").dynamic_compressor()
        m.option("bs").dynamic(1 << 18)
        m.option("shared").dynamic(0)
        return m

    def _inner(self):
        av = self.env.option("inner").as_algorithm()
        comp = self.env.registry.select_algorithm(av, "compressor")
        return comp, av

    def compress(self, inp: Input, out: Output) -> None:
        bs = self.env.option("bs").as_integer()
        shared = bool(self.env.option("shared").as_integer())
        comp, av = self._inner()
        data = inp.as_array()
        if av.id_string() in ("encode(coder=huff)", "encode(huff)") and _device_available():
            with StatPhase("device blockwise encode") as ph:
                from ..parallel.runtime import blockwise_huffman_compress

                ph.log("bs", bs)
                out.write(blockwise_huffman_compress(bytes(data), bs, shared_table=shared))
                return
        blocks, n_valid = split_blocks(data, bs)
        batch = getattr(comp, "compress_block_batch", None)
        if batch is not None and _device_available():
            payloads = batch(blocks, n_valid)
            if payloads is not None:
                out.write(frame_streams(payloads, bs))
                return
        with StatPhase("host blockwise encode"):
            payloads = []
            for i in range(len(blocks)):
                o = Output()
                comp.compress(Input(blocks[i, : n_valid[i]]), o)
                payloads.append(o.raw_value())
            out.write(frame_streams(payloads, bs))

    def decompress(self, inp: Input, out: Output) -> None:
        comp, av = self._inner()
        block_size, payloads = unframe_streams(inp.as_bytes())
        from ..device import use_device

        if av.id_string() in ("encode(coder=huff)", "encode(huff)") and use_device(
            "TDC_DEVICE_HUFF"
        ):
            with StatPhase("device blockwise decode"):
                from ..ops.huffman_decode import decode_payloads_device

                for part in decode_payloads_device(payloads, max_out=block_size):
                    out.write(np.frombuffer(part, np.uint8))
                return
        with StatPhase("blockwise decode"):
            for p in payloads:
                comp.decompress(Input(np.frombuffer(p, np.uint8)), out)


def register(registry):
    registry.register(BlockwiseCompressor)
