"""Probe: per-stage jit compile + run times through the axon tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np


def probe(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"{name:24s} compile+run {t1-t0:8.2f}s   run {(t2-t1)*1e3:9.2f}ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)

    x = jnp.ones((1024, 1024), jnp.bfloat16)
    probe("matmul", jax.jit(lambda a: a @ a), x)

    from tudocomp_tpu.ops import huffman_jax as hj

    B, bs = 64, 1 << 18
    n_words = (9 * bs + 4096 + 31) // 32
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.zipf(1.3, (B, bs)).clip(0, 255).astype(np.uint8)
    )
    n_valid = jnp.full((B,), bs, jnp.int32)

    hists = probe("hist", jax.jit(hj.block_histograms), blocks, n_valid)
    lengths = probe("code_lengths", jax.jit(hj.code_lengths_batch), hists)
    probe("canonical", jax.jit(jax.vmap(hj.canonical_codes)), lengths)

    def tok_pack(blocks, n_valid, lengths):
        return jax.vmap(
            lambda b, nv, ln: hj._encode_one_block(b, nv, ln, n_words, True)
        )(blocks, n_valid, lengths)

    probe("tok+pack", jax.jit(tok_pack), blocks, n_valid, lengths)
    out = probe("WHOLE", jax.jit(lambda b, v: hj.encode_blocks(b, v, n_words)), blocks, n_valid)

    # steady state
    t0 = time.perf_counter()
    for _ in range(5):
        out = hj.encode_blocks(blocks, n_valid, n_words)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"steady: {dt*1e3:.2f} ms -> {B*bs/dt/1e9:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
