#!/usr/bin/env python3
"""Block-parallel scaling report (SURVEY.md §2.11 item 4).

Measures the DP block-encode pipeline at 1, 2, 4, ... devices and reports
throughput + scaling efficiency. On a real pod slice this runs over the
actual mesh (multi-host after jax.distributed.initialize); without TPU
hardware pass --cpu N to simulate N virtual devices
(xla_force_host_platform_device_count), which validates the sharding and
collective structure (efficiency numbers are then only indicative —
virtual CPU devices share cores).

Usage:
    python etc/scaling.py [--cpu 8] [--mb 64] [--bs 262144] [--shared]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, help="simulate N CPU devices")
    ap.add_argument("--mb", type=float, default=64)
    ap.add_argument("--bs", type=int, default=1 << 18)
    ap.add_argument("--shared", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()

    import jax

    if args.cpu:
        # env vars alone can't undo a sitecustomize-registered remote-TPU
        # plugin; force the platform before backends initialize
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tudocomp_tpu.parallel.blocks import pad_block_count, split_blocks
    from tudocomp_tpu.parallel.runtime import dp_mesh, make_block_encoder

    devices = jax.devices()
    rng = np.random.default_rng(0)
    n = int(args.mb * (1 << 20))
    data = rng.zipf(1.3, n).clip(0, 255).astype(np.uint8).tobytes()
    n_words = (9 * args.bs + 4096 + 31) // 32

    results = []
    d = 1
    while d <= len(devices):
        mesh = dp_mesh(devices[:d])
        blocks, n_valid = split_blocks(data, args.bs)
        blocks, n_valid, _ = pad_block_count(blocks, n_valid, d)
        step = make_block_encoder(mesh, n_words, shared_table=args.shared)
        db = jax.device_put(blocks, NamedSharding(mesh, P("dp", None)))
        dv = jax.device_put(n_valid, NamedSharding(mesh, P("dp")))
        # NB: block_until_ready does not synchronize through remote-TPU
        # tunnels; a host fetch is the only true sync
        np.asarray(step(db, dv)[1])  # compile + warm + sync
        t0 = time.perf_counter()
        outs = [step(db, dv) for _ in range(args.iters)]
        for _w, bits in outs:
            np.asarray(bits[:1])
        dt = (time.perf_counter() - t0) / args.iters
        gbps = n / dt / 1e9
        results.append({"devices": d, "gbps": round(gbps, 4)})
        base = results[0]["gbps"]
        eff = gbps / (base * d) if base else 0.0
        print(
            f"devices={d:3d}  {gbps:8.3f} GB/s  scaling efficiency "
            f"{eff*100:6.1f}%",
            flush=True,
        )
        d *= 2

    print(json.dumps({
        "metric": "blockwise_huffman_encode_scaling",
        "block_size": args.bs,
        "shared_table": args.shared,
        "results": results,
    }))


if __name__ == "__main__":
    main()
