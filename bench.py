"""Benchmark: block-parallel Huffman encode throughput on the local device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no first-party
numbers; the repo target is >= 1 GB/s aggregate encode on a v5e-8, i.e.
0.125 GB/s per chip. vs_baseline is measured GB/s divided by that per-chip
share, so vs_baseline >= 1.0 means the single-chip target is met.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compile cache: first-ever run pays the (slow, remote)
    # compile; later runs hit the cache
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tudocomp_tpu.ops.huffman_jax import encode_blocks

    B, bs = 64, 1 << 18  # 16 MiB per step
    n_words = (9 * bs + 4096 + 31) // 32

    rng = np.random.default_rng(0)
    # zipf-distributed bytes: a realistic text-like skewed histogram
    payload = rng.zipf(1.3, B * bs).clip(0, 255).astype(np.uint8)
    blocks = jnp.asarray(payload.reshape(B, bs))
    n_valid = jnp.full((B,), bs, jnp.int32)

    fn = jax.jit(lambda b, v: encode_blocks(b, v, n_words))
    jax.block_until_ready(fn(blocks, n_valid))  # compile + warm

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(blocks, n_valid)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    gbps = (B * bs) / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "huffman_block_encode_throughput",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 0.125, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
