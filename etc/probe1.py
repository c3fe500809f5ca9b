"""One careful probe: compile + true-sync steady state of encode_blocks."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_start = time.time()


def lg(msg):
    print(f"[{time.time()-t_start:7.1f}s] {msg}", flush=True)


import numpy as np
import jax
import jax.numpy as jnp

lg(f"devices {jax.devices()}")

from tudocomp_tpu.ops.huffman_jax import encode_blocks

B, bs = 64, 1 << 18
n_words = (9 * bs + 4096 + 31) // 32
rng = np.random.default_rng(0)
payload = rng.zipf(1.3, B * bs).clip(0, 255).astype(np.uint8)
blocks = jax.device_put(jnp.asarray(payload.reshape(B, bs)))
n_valid = jnp.full((B,), bs, jnp.int32)
# force the input transfer to finish before compiling
_ = np.asarray(blocks[0, :8])
lg("inputs on device")

fn = jax.jit(lambda b, v: encode_blocks(b, v, n_words))
t0 = time.time()
words, bits = fn(blocks, n_valid)
host_bits = np.asarray(bits)  # true sync
lg(f"compile+first-run {time.time()-t0:.1f}s bits[:3]={host_bits[:3]}")

for it in range(3):
    t0 = time.time()
    words, bits = fn(blocks, n_valid)
    _ = np.asarray(bits)
    dt = time.time() - t0
    lg(f"iter {it}: {dt*1e3:.1f} ms -> {B*bs/dt/1e9:.3f} GB/s")
lg("done")
