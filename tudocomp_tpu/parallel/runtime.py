"""Data-parallel block compression runtime over a JAX device mesh.

The distributed layer of the framework (SURVEY.md §2.11, BASELINE.json):
blocks are sharded over the mesh's "dp" axis; shared entropy tables are
formed by psum'ing per-device histograms over ICI; compressed word arenas
and bit counts are gathered back in deterministic block order so the framed
container is bit-exact regardless of device count.

Single-host multi-chip uses one process; multi-host pods initialize
jax.distributed and shard the global block array the same way (the dp axis
spans hosts x chips; blocks stay host-local, only 256-entry histograms and
per-block bit counts cross DCN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import huffman_jax
from ..ops.bitpack import finalize_stream
from .blocks import frame_streams, pad_block_count, split_blocks

__all__ = ["dp_mesh", "make_block_encoder", "blockwise_huffman_compress"]


def dp_mesh(devices=None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), ("dp",))


def make_block_encoder(mesh: Mesh, n_words: int, shared_table: bool = False):
    """Build the jitted DP block-encode step for a mesh.

    Returns step(blocks [B, bs] u8, n_valid [B]) -> (words [B, n_words] u32,
    bits [B] i32), with B divisible by the dp axis size. shared_table=True
    psums histograms over dp so every block uses one global Huffman table
    (emitted per block for self-containedness).
    """

    def local_encode(blocks, n_valid):
        hists = huffman_jax.block_histograms(blocks, n_valid)
        if shared_table:
            # global histogram: sum local blocks, then psum across the mesh;
            # solve the table once per device, broadcast lengths to blocks
            local = jnp.sum(hists, axis=0)
            glob = jax.lax.psum(local, "dp")
            lengths = huffman_jax.code_lengths_batch(glob[None, :])
            lengths = jnp.broadcast_to(lengths[0], (blocks.shape[0], 256))
            return huffman_jax.encode_blocks_from_lengths(
                blocks, n_valid, lengths, n_words, True
            )
        return huffman_jax.encode_blocks_with_hists(
            blocks, n_valid, hists, n_words
        )

    step = shard_map(
        local_encode,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs=(P("dp", None), P("dp")),
        # fori_loop carries start as unvarying literals; skip the
        # varying-manual-axes consistency analysis (jax>=0.8 check_vma)
        check_vma=False,
    )
    return jax.jit(step)


def blockwise_huffman_compress(
    data,
    block_size: int = 1 << 18,
    mesh: Mesh = None,
    shared_table: bool = False,
) -> bytes:
    """End-to-end block-parallel Huffman encode -> framed container bytes."""
    mesh = mesh or dp_mesh()
    ndev = mesh.devices.size
    blocks, n_valid = split_blocks(data, block_size)
    blocks, n_valid, n_real = pad_block_count(blocks, n_valid, ndev)
    n_words = (9 * block_size + 4096 + 31) // 32

    step = make_block_encoder(mesh, n_words, shared_table)
    sharding = NamedSharding(mesh, P("dp"))
    dblocks = jax.device_put(blocks, NamedSharding(mesh, P("dp", None)))
    dvalid = jax.device_put(n_valid, sharding)
    words, bits = jax.block_until_ready(step(dblocks, dvalid))

    if jax.process_count() > 1:
        # multi-host: the output arrays are globally sharded; gather the
        # ordered streams to every host over DCN (deterministic block
        # order keeps the container bit-exact for any process count)
        from jax.experimental import multihost_utils

        words = np.asarray(multihost_utils.process_allgather(words, tiled=True))
        bits = np.asarray(multihost_utils.process_allgather(bits, tiled=True))
    else:
        words = np.asarray(words)
        bits = np.asarray(bits)
    payloads = [
        finalize_stream(words[i], int(bits[i])) for i in range(n_real)
    ]
    return frame_streams(payloads, block_size)


def blockwise_huffman_decompress(container: bytes, device: bool = False) -> bytes:
    """Decode the framed container (per-block huff decode).

    device=True runs the bulk symbol decode as one batched device call
    (jump-table + pointer-doubling kernel, ops/huffman_decode.py); host
    parses only the per-block table headers.
    """
    from .blocks import unframe_streams

    block_size, payloads = unframe_streams(container)
    if device:
        from ..ops.huffman_decode import decode_payloads_device

        return b"".join(decode_payloads_device(payloads, max_out=block_size))
    from ..driver import decompress

    out = bytearray()
    for p in payloads:
        out += decompress(p, id_string="encode(huff)", raw=True)
    return bytes(out)
