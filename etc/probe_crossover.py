#!/usr/bin/env python3
"""Device-vs-host crossover measurements for the use_device() gates.

Times the device and host implementations of SA construction, LZSS
factorize-candidates, and MTF at 1/4/16 MiB on the active backend, with
true host-fetch syncs (block_until_ready does not synchronize through the
remote-TPU tunnel). Results justify (or retune) the min_n=4MiB defaults in
device.py policy; recorded in PERF.md.

Usage: python etc/probe_crossover.py [--sizes 1,4,16] [--kind dna|english]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def timed(fn, sync, iters=3):
    fn(); sync()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,4,16")
    ap.add_argument("--kind", default="english")
    ap.add_argument("--stages", default="sa,fact", help="comma subset of sa,fact")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "etc"))
    from datasets import synth_dna, synth_english

    from tudocomp_tpu import native
    from tudocomp_tpu.ds.suffix_array import suffix_array_jax
    from tudocomp_tpu.ops.lzss_jax import lzss_lcp_candidates

    lib = native.get_lib()
    print("backend:", jax.default_backend(), flush=True)
    rows = []
    for mb in [float(s) for s in args.sizes.split(",")]:
        n = int(mb * (1 << 20))
        rng = np.random.default_rng(0)
        synth = synth_dna if args.kind == "dna" else synth_english
        text = np.frombuffer(synth(rng, n - 1) + b"\x00", np.uint8).copy()

        # host SA (native SA-IS)
        sa_h = np.empty(n, np.int32)
        t_sa_host = timed(lambda: lib.tdc_sais(text, n, sa_h), lambda: None)

        stages = args.stages.split(",")
        # device SA (prefix doubling)
        dt_text = jnp.asarray(text)
        t_sa_dev = -1.0
        if "sa" in stages:
            f_sa = jax.jit(suffix_array_jax)
            out = [None]
            def dev_sa():
                out[0] = f_sa(dt_text)
            t_sa_dev = timed(dev_sa, lambda: np.asarray(out[0]).sum())
            sa_d = np.asarray(out[0]).astype(np.int32)
            assert (sa_d == sa_h).all(), "device SA mismatch"

        # host factorize inputs
        isa = np.empty(n, np.int32); isa[sa_h] = np.arange(n, dtype=np.int32)
        plcp = np.empty(n, np.int32)
        lib.tdc_plcp_from_phi(text, n, _phi(sa_h), plcp)
        lcp = plcp[sa_h]; lcp[0] = 0

        t_fact_host = timed(
            lambda: _host_factorize(lib, text, sa_h, isa, lcp.astype(np.int32)),
            lambda: None, iters=1,
        )

        t_fact_dev = -1.0
        if "fact" in stages:
            dsa = jnp.asarray(sa_h); disa = jnp.asarray(isa); dlcp = jnp.asarray(lcp.astype(np.int32))
            f_cand = jax.jit(lambda s, i, l: lzss_lcp_candidates(s, i, l, 3))
            o2 = [None]
            def dev_cand():
                o2[0] = f_cand(dsa, disa, dlcp)
            t_fact_dev = timed(dev_cand, lambda: [np.asarray(x).sum() for x in o2[0]], iters=1)

        row = {
            "mb": mb, "kind": args.kind,
            "sa_host_s": round(t_sa_host, 4), "sa_dev_s": round(t_sa_dev, 4),
            "fact_host_s": round(t_fact_host, 4), "fact_dev_s": round(t_fact_dev, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)


def _phi(sa):
    n = len(sa)
    phi = np.empty(n, np.int32)
    phi[sa] = sa[np.arange(n) - 1]
    return phi


def _host_factorize(lib, text, sa, isa, lcp):
    n = len(text)
    fpos = np.empty(n, np.uint32); fsrc = np.empty(n, np.uint32); flen = np.empty(n, np.uint32)
    return lib.tdc_lzss_lcp_factorize(sa, isa, lcp, n, 3, fpos, fsrc, flen)


if __name__ == "__main__":
    main()
