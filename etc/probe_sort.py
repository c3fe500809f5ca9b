#!/usr/bin/env python3
"""Probe: XLA TPU sort / gather / scatter primitive costs at SA scales.

Measures, at n = 4M/16M elements:
  - lax.sort with num_keys = 1,2,3,4 (+1 value operand) on i32/u32
  - a 16M random gather (rank[idx]) and unique-index scatter (.at[].set)
  - cumsum over i32
These set the per-round budget for the prefix-doubling SA redesign
(VERDICT r4 item 2). True host-fetch syncs (tunnel rules in PERF.md).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))


def timed(fn, iters=4):
    r = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:1])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
    return (time.perf_counter() - t0) / iters


def main():
    sizes = [4 << 20, 16 << 20]
    rng = np.random.default_rng(0)
    for n in sizes:
        keys = [jnp.asarray(rng.integers(0, n, n).astype(np.int32)) for _ in range(4)]
        idx = jnp.arange(n, dtype=jnp.int32)
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        print(f"--- n = {n >> 20} Mi ---")
        for q in (1, 2, 3, 4):
            f = jax.jit(lambda *ops, q=q: jax.lax.sort(ops, num_keys=q)[-1])
            t = timed(lambda: f(*keys[:q], idx))
            print(f"sort num_keys={q} ({q+1} ops): {t*1e3:8.1f} ms")
        g = jax.jit(lambda r, p: r[p])
        print(f"gather 16M-ish:            {timed(lambda: g(keys[0], perm))*1e3:8.1f} ms")
        s = jax.jit(lambda r, p: jnp.zeros_like(r).at[p].set(r))
        print(f"scatter unique:            {timed(lambda: s(keys[0], perm))*1e3:8.1f} ms")
        c = jax.jit(lambda r: jnp.cumsum(r))
        print(f"cumsum:                    {timed(lambda: c(keys[0]))*1e3:8.1f} ms")
        r2 = jax.jit(lambda r: jnp.roll(r, -12345))
        print(f"roll:                      {timed(lambda: r2(keys[0]))*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
