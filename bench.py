"""Benchmark: block-parallel Huffman encode throughput on the local device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no first-party
numbers; the repo target is >= 1 GB/s aggregate encode on a v5e-8, i.e.
0.125 GB/s per chip. vs_baseline is measured GB/s divided by that per-chip
share, so vs_baseline >= 1.0 means the single-chip target is met.

Robustness: the remote-TPU tunnel in this environment can wedge (single
tenant; compiles go through a relay). The measurement runs in a daemon
thread with a deadline; if the device never answers, a degraded CPU
measurement is reported instead of hanging the driver.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

DEADLINE_S = float(os.environ.get("TDC_BENCH_DEADLINE", "540"))


def measure(result: dict) -> None:
    import jax

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
    result["gbps"] = (B * bs) / dt / 1e9
    result["backend"] = jax.default_backend()


def main():
    result: dict = {}
    t = threading.Thread(target=measure, args=(result,), daemon=True)
    t.start()
    t.join(DEADLINE_S)
    if "gbps" not in result:
        # device unresponsive: degraded host-throughput fallback so the
        # driver still records a data point
        import sys
        import subprocess

        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            timeout=DEADLINE_S,
            text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if line.startswith("{"):
            doc = json.loads(line)
            if not doc["metric"].endswith("_fallback"):
                doc["metric"] += "_fallback"
            print(json.dumps(doc))
            return
        result["gbps"] = 0.0
        result["backend"] = "unavailable"
    gbps = result["gbps"]
    suffix = "" if result.get("backend") == "tpu" else f"_{result.get('backend')}"
    print(
        json.dumps(
            {
                "metric": "huffman_block_encode_throughput" + suffix,
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 0.125, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
