"""Pallas pack kernel vs the XLA reference pack (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tudocomp_tpu.ops.bitpack import pack_tokens
from tudocomp_tpu.ops.bitpack_pallas import pack_blocks_pallas


def ref_pack(values, nbits, n_words):
    w, b = jax.vmap(lambda v, n: pack_tokens(v, n, n_words))(
        jnp.asarray(values), jnp.asarray(nbits)
    )
    return np.asarray(w), np.asarray(b)


def run_case(values, nbits, n_words):
    got_w, got_b = pack_blocks_pallas(
        jnp.asarray(values), jnp.asarray(nbits), n_words, True
    )
    want_w, want_b = ref_pack(values, nbits, n_words)
    np.testing.assert_array_equal(np.asarray(got_b), want_b)
    np.testing.assert_array_equal(np.asarray(got_w), want_w)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("maxw", [5, 13, 33])
def test_random_tokens(seed, maxw):
    rng = np.random.default_rng(seed)
    B, NT = 3, 2500
    nbits = rng.integers(0, maxw, (B, NT)).astype(np.int32)
    nbits = np.minimum(nbits, 32)
    values = rng.integers(0, 1 << 31, (B, NT)).astype(np.uint32)
    n_words = int(nbits.sum(1).max()) // 32 + 3
    run_case(values, nbits, n_words)


def test_full_width_tokens():
    B, NT = 2, 1024
    nbits = np.full((B, NT), 32, np.int32)
    rng = np.random.default_rng(3)
    values = rng.integers(0, 1 << 62, (B, NT)).astype(np.uint64).astype(np.uint32)
    run_case(values, nbits, NT + 2)


def test_zero_width_runs():
    B, NT = 2, 2048
    rng = np.random.default_rng(4)
    nbits = rng.integers(1, 9, (B, NT)).astype(np.int32)
    nbits[:, 100:900] = 0
    nbits[1, :] = 0
    values = rng.integers(0, 256, (B, NT)).astype(np.uint32)
    run_case(values, nbits, 600)


def test_single_bit_stream():
    B, NT = 1, 1024
    nbits = np.ones((B, NT), np.int32)
    values = (np.arange(NT) % 2).astype(np.uint32)[None]
    run_case(values, nbits, 40)


def test_overflow_drops_bits_like_pack_tokens():
    # stream exceeds the arena: words near the n_words boundary must match
    # pack_tokens' clean per-word drop (ADVICE r2 item 1)
    rng = np.random.default_rng(6)
    B, NT = 2, 2048
    nbits = rng.integers(8, 33, (B, NT)).astype(np.int32)
    values = rng.integers(0, 1 << 31, (B, NT)).astype(np.uint32)
    run_case(values, nbits, 200)


def test_empty_token_stream():
    # NT == 0 must return zeroed arenas, not uninitialized memory
    run_case(np.zeros((3, 0), np.uint32), np.zeros((3, 0), np.int32), 8)


def test_tail_padding_multiple_tiles():
    rng = np.random.default_rng(5)
    B, NT = 2, 3000  # pads to 3072, crosses tile boundaries mid-stream
    nbits = rng.integers(0, 33, (B, NT)).astype(np.int32)
    values = rng.integers(0, 1 << 31, (B, NT)).astype(np.uint32)
    n_words = int(nbits.sum(1).max()) // 32 + 3
    run_case(values, nbits, n_words)


def test_packed_kernels_bit_identical():
    """pack=2/4 byte-folding kernels match pack=1 bit-for-bit
    (code concatenation associativity; caller guarantees len <= 32/pack)."""
    import numpy as np
    import jax.numpy as jnp

    from tudocomp_tpu.ops.bitpack_pallas import pack_bytes_blocks_pallas

    rng = np.random.default_rng(0)
    B, bs = 2, 4096
    n_words = (9 * bs + 4096 + 31) // 32
    blocks = jnp.asarray(rng.integers(0, 256, (B, bs)).astype(np.uint8))
    n_valid = jnp.asarray([bs, 29], np.int32)
    for maxl, packs in [(4, (1, 2, 4, 8)), (8, (1, 2, 4)), (16, (1, 2))]:
        tl = rng.integers(1, maxl + 1, (B, 256)).astype(np.int32)
        tv = np.array(
            [[rng.integers(0, 1 << l) for l in row] for row in tl], np.int32
        )
        hdr_w = jnp.zeros((B, 4), jnp.uint32)
        hdr_b = jnp.asarray([13, 0], jnp.int32)
        ref = None
        for pack in packs:
            w, b = pack_bytes_blocks_pallas(
                blocks, n_valid, jnp.asarray(tv), jnp.asarray(tl),
                hdr_w, hdr_b, n_words, interpret=True, pack=pack,
            )
            w, b = np.asarray(w), np.asarray(b)
            if ref is None:
                ref = (w, b)
            else:
                assert (b == ref[1]).all(), (maxl, pack)
                assert (w == ref[0]).all(), (maxl, pack)
