#!/usr/bin/env python3
"""Probe: staged-compaction device SA (suffix_array_device) vs the old
two-key doubling (suffix_array_jax) vs native host SA-IS, at 1/4/16 MiB.

Pipelined timing with host-fetch syncs (tunnel rules, PERF.md). Also
validates device output == host SA-IS output on each input.
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

from datasets import synth_dna, synth_english
from tudocomp_tpu.ds.suffix_array import suffix_array_device, suffix_array_jax
from tudocomp_tpu import native


def timed(fn, iters=3):
    r = fn()
    _ = np.asarray(r[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = np.asarray(r[:4])
    return (time.perf_counter() - t0) / iters, r


def host_sais(arr):
    lib = native.get_lib()
    out = np.zeros(len(arr), np.int32)
    lib.tdc_sais(arr, len(arr), out)
    return out


def main():
    lib = native.get_lib()
    sizes = [1 << 20, 4 << 20, 16 << 20]
    kinds = {"english": synth_english, "dna": synth_dna}
    old = "--old" in sys.argv
    for kind, synth in kinds.items():
        rng = np.random.default_rng(7)
        for n in sizes:
            arr = np.frombuffer(synth(rng, n), np.uint8).copy()
            arr[-1] = 0
            d = jnp.asarray(arr)
            f_new = jax.jit(suffix_array_device)
            t_new, r = timed(lambda: f_new(d))
            got = np.asarray(r)
            t0 = time.perf_counter()
            want = host_sais(arr)
            t_host = time.perf_counter() - t0
            ok = (got == want).all()
            line = (f"{kind:8s} {n>>20:3d} MiB: device-staged {t_new*1e3:7.0f} ms"
                    f"  host SA-IS {t_host*1e3:7.0f} ms  match={ok}")
            if old:
                f_old = jax.jit(suffix_array_jax)
                t_old, _ = timed(lambda: f_old(d))
                line += f"  device-old {t_old*1e3:7.0f} ms"
            print(line, flush=True)


if __name__ == "__main__":
    main()
