#!/usr/bin/env python3
"""Probe: device lzss factorize stack (PLCP segment-scan, compacted ANSV,
orbit greedy) vs the host natives at 1/4/16 MiB. Pipelined host-fetch
syncs. Device times are data-resident (inputs pre-staged); the host column
is the tuned native pipeline stage."""
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
from tudocomp_tpu import native
from tudocomp_tpu.ds.suffix_array import (
    inverse_permutation, phi_from_sa, plcp_from_phi_numpy, lcp_from_plcp)
from tudocomp_tpu.ops.plcp_jax import plcp_device
from tudocomp_tpu.ops.lzss_jax import ansv_minlcp, lzss_lcp_candidates, greedy_visited


def timed(fn, iters=3):
    r = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0][:4])
    return (time.perf_counter() - t0) / iters, r


def main():
    lib = native.get_lib()
    for kind, synth in (("english", synth_english), ("dna", synth_dna)):
        rng = np.random.default_rng(7)
        for mb in (1, 4, 16):
            n = mb << 20
            arr = np.frombuffer(synth(rng, n), np.uint8).copy()
            arr[arr == 0] = 1
            arr[-1] = 0
            sa = np.zeros(n, np.int32)
            lib.tdc_sais(arr, n, sa)
            isa = inverse_permutation(sa)
            t0 = time.perf_counter()
            phi = phi_from_sa(sa)
            plcp = np.zeros(n, np.int32)
            lib.tdc_plcp_from_phi(arr, n, phi, plcp)
            lcp = lcp_from_plcp(plcp, sa)
            t_lcp_host = time.perf_counter() - t0

            fpos = np.empty(n, np.uint32); fsrc = np.empty(n, np.uint32)
            flen = np.empty(n, np.uint32)
            t0 = time.perf_counter()
            nf = lib.tdc_lzss_lcp_factorize(sa, isa, lcp, n, 3, fpos, fsrc, flen)
            t_fact_host = time.perf_counter() - t0

            d_text = jnp.asarray(arr); d_sa = jnp.asarray(sa)
            d_isa = jnp.asarray(isa); d_lcp = jnp.asarray(lcp)
            f_plcp = jax.jit(lambda t, s: plcp_device(t, s))
            t_plcp_dev, d_plcp = timed(lambda: f_plcp(d_text, d_sa))
            ok_plcp = (np.asarray(d_plcp) == plcp).all()

            f_ansv = jax.jit(ansv_minlcp)
            t_ansv_dev, _ = timed(lambda: f_ansv(d_sa, d_lcp))

            @jax.jit
            def cand_greedy(sa_, isa_, lcp_):
                step, fl, fs = lzss_lcp_candidates(sa_, isa_, lcp_, 3)
                return greedy_visited(step), fl, fs

            t_cg, (vis, fl, fs) = timed(lambda: cand_greedy(d_sa, d_isa, d_lcp))
            sel = np.asarray(vis) & (np.asarray(fl) > 0)
            pos_d = np.flatnonzero(sel)
            ok_f = (len(pos_d) == nf and (pos_d == fpos[:nf]).all()
                    and (np.asarray(fs)[pos_d] == fsrc[:nf].astype(np.int32)).all()
                    and (np.asarray(fl)[pos_d] == flen[:nf].astype(np.int32)).all())
            print(f"{kind:8s}{mb:3d} MiB | LCP host {t_lcp_host*1e3:6.0f} dev(plcp) "
                  f"{t_plcp_dev*1e3:6.0f} ok={ok_plcp} | fact host {t_fact_host*1e3:6.0f}"
                  f" dev ansv {t_ansv_dev*1e3:6.0f} + cand/greedy {t_cg*1e3:6.0f}"
                  f" ok={ok_f}", flush=True)


if __name__ == "__main__":
    main()
