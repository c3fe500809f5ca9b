#!/usr/bin/env python3
"""Probe: staged device ESP grammar (ops/esp_jax.py) vs host rounds.

Measures, per corpus/size:
  - host generate_grammar (native tdc_esp_round) wall
  - device esp_grammar_device e2e (upload + staged rounds + rule fetch +
    host finish below the threshold)
  - device stage chain only (rounds on device, sync on the count scalars)
and asserts the device result equals the host grammar bit-exactly.

Tunnel measurement rules per PERF.md: host fetches are the only true
syncs; first call compiles (report warm numbers).
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

from datasets import synth_dna, synth_english, synth_sources
from tudocomp_tpu.compressors.esp import generate_grammar
from tudocomp_tpu.ops import esp_jax


def stages_only(data: np.ndarray, threshold: int) -> float:
    """Time the device round chain alone (counts fetched as the sync)."""
    n = len(data)
    size = 1
    while size < n:
        size *= 2
    pad = np.zeros(size, np.int32)
    pad[:n] = data
    src0 = jnp.asarray(pad)  # upload excluded; timed separately

    def chain():
        src, m, alphabet = src0, jnp.int32(n), jnp.int32(256)
        s = size
        outs = []
        while s // 2 >= threshold:
            nxt, nb, rl, rr, K, fb = esp_jax._round_jit(s, max(8, s // 8))(src, m, alphabet)
            outs.append((K, fb, nb))
            src, m, alphabet = nxt, nb, K
            s //= 2
        return jnp.stack([o[0] for o in outs])

    _ = np.asarray(chain())  # warm / compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        counts = chain()
    _ = np.asarray(counts)
    return (time.perf_counter() - t0) / reps


def main():
    threshold = int(os.environ.get("ESP_THRESH", 1 << 15))
    sizes = [
        int(s) << 20
        for s in os.environ.get("ESP_SIZES", "1,4,16").split(",")
    ]
    kind_sel = os.environ.get("ESP_KINDS", "english,dna,sources").split(",")
    kinds = {
        k: f
        for k, f in (
            ("english", synth_english),
            ("dna", synth_dna),
            ("sources", synth_sources),
        )
        if k in kind_sel
    }
    for kind, synth in kinds.items():
        rng = np.random.default_rng(7)
        for n in sizes:
            data = np.frombuffer(synth(rng, n), np.uint8)
            t0 = time.perf_counter()
            ref = generate_grammar(data)
            t_host = time.perf_counter() - t0

            got = esp_grammar_timed = None
            t0 = time.perf_counter()
            got = esp_jax.esp_grammar_device(data, threshold=threshold)
            t_dev_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = esp_jax.esp_grammar_device(data, threshold=threshold)
            t_dev = time.perf_counter() - t0

            ok = (
                np.array_equal(ref[0], got[0])
                and ref[1] == got[1]
                and ref[2] == got[2]
            )
            t_k = stages_only(data, threshold)
            print(
                f"{kind:8s} {n>>20:3d} MiB  host {t_host*1e3:7.0f} ms  "
                f"device e2e {t_dev*1e3:7.0f} ms (cold {t_dev_cold*1e3:.0f})  "
                f"stages-only {t_k*1e3:7.0f} ms  rules={len(ref[0])}  "
                f"match={ok}"
            )
            assert ok, f"device grammar mismatch on {kind} {n}"


if __name__ == "__main__":
    main()
