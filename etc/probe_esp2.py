#!/usr/bin/env python3
"""Probe: per-stage timing of the device ESP round at 1/4 MiB english.

Times _stage_blocks, _adjust_dev, _stage_naming as separate jits on real
round-0 data (pipelined, host-fetch sync) to locate the device wall.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "etc"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from datasets import synth_english
from tudocomp_tpu.ops import esp_jax


def timed(fn, sync, iters=5):
    r = fn()
    _ = sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    import functools

    for mb in (1, 4):
        n = mb << 20
        data = np.frombuffer(synth_english(np.random.default_rng(7), n), np.uint8)
        size = 1
        while size < n:
            size *= 2
        pad = np.zeros(size, np.int32)
        pad[:n] = data
        src = jnp.asarray(pad)
        m = jnp.int32(n)
        al = jnp.int32(256)

        f_blocks = jax.jit(functools.partial(esp_jax._stage_blocks, size=size))
        f_adjust = jax.jit(
            functools.partial(esp_jax._adjust_dev, nw_cap=max(8, size // 8))
        )
        f_naming = jax.jit(functools.partial(esp_jax._stage_naming, size=size))
        f_round = esp_jax._round_jit(size, max(8, size // 8))

        lens, typs, nb = f_blocks(src, m, al)
        t_b = timed(lambda: f_blocks(src, m, al), lambda r: int(np.asarray(r[2])))
        al_, at_, an_, fb = f_adjust(lens, typs, nb)
        t_a = timed(
            lambda: f_adjust(lens, typs, nb), lambda r: int(np.asarray(r[2]))
        )
        t_n = timed(
            lambda: f_naming(src, m, al, al_, at_, an_),
            lambda r: int(np.asarray(r[3])),
        )
        t_r = timed(
            lambda: f_round(src, m, al), lambda r: int(np.asarray(r[4]))
        )
        print(
            f"english {mb} MiB round-0: blocks {t_b*1e3:6.1f} ms  "
            f"adjust {t_a*1e3:6.1f} ms  naming {t_n*1e3:6.1f} ms  "
            f"full-round {t_r*1e3:6.1f} ms"
        )


if __name__ == "__main__":
    main()
