"""TPU trial of the pallas pack kernel + full encode pipeline v2 timing."""

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

from tudocomp_tpu.ops.bitpack import pack_tokens
from tudocomp_tpu.ops.bitpack_pallas import pack_blocks_pallas
from tudocomp_tpu.ops import huffman_jax as hj

# --- correctness: small random tokens vs XLA reference ---
rng = np.random.default_rng(0)
B0, NT0 = 2, 2500
nbits0 = rng.integers(0, 33, (B0, NT0)).astype(np.int32)
vals0 = rng.integers(0, 1 << 31, (B0, NT0)).astype(np.uint32)
nw0 = int(nbits0.sum(1).max()) // 32 + 3
t0 = time.time()
try:
    got_w, got_b = pack_blocks_pallas(jnp.asarray(vals0), jnp.asarray(nbits0), nw0)
    got_w, got_b = np.asarray(got_w), np.asarray(got_b)
    lg(f"pack kernel compiled+ran in {time.time()-t0:.1f}s")
    want_w, want_b = jax.vmap(lambda v, n: pack_tokens(v, n, nw0))(
        jnp.asarray(vals0), jnp.asarray(nbits0)
    )
    ok_w = np.array_equal(got_w, np.asarray(want_w))
    ok_b = np.array_equal(got_b, np.asarray(want_b))
    lg(f"pack kernel vs reference: words={'OK' if ok_w else 'MISMATCH'} bits={'OK' if ok_b else 'MISMATCH'}")
    if not ok_w:
        d = np.argwhere(got_w != np.asarray(want_w))
        lg(f"first diffs {d[:5]} got {got_w[tuple(d[0])]:#x} want {np.asarray(want_w)[tuple(d[0])]:#x}")
except Exception as e:
    lg(f"pack kernel FAILED: {type(e).__name__}: {str(e)[:800]}")
    sys.exit(1)

# --- timing at bench scale ---
B, bs = 8, 1 << 21
NT = 393 + bs
n_words = (9 * bs + 4096 + 31) // 32
NB = B * bs


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
    t_c = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = [np.asarray(x)[:1] for x in jax.tree_util.tree_leaves(out)]
        times.append(time.time() - t0)
    dt = min(times)
    lg(f"{name:22s} compile {t_c:6.1f}s  run {dt*1e3:9.2f} ms  {NB/dt/1e9:7.3f} GB/s")
    return out


def mk(key):
    u = jax.random.uniform(key, (B, NT), jnp.float32, 1e-6, 1.0)
    nb = jnp.clip(jnp.floor(-3.0 * jnp.log(u)).astype(jnp.int32) + 1, 1, 32)
    vals = jax.random.randint(key, (B, NT), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
    return vals, nb


vals, nb = jax.jit(mk)(jax.random.PRNGKey(1))
f_pk = jax.jit(lambda v, n: pack_blocks_pallas(v, n, n_words))
bench("pack/pallas", f_pk, vals, nb)

# --- full pipeline v2 ---
def gen(key):
    u = jax.random.uniform(key, (B, bs), jnp.float32, 1e-6, 1.0)
    v = jnp.floor(-40.0 * jnp.log(u)).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


blocks = jax.jit(gen)(jax.random.PRNGKey(0))
n_valid = jnp.full((B,), bs, jnp.int32)

f_all = jax.jit(lambda b, v: hj.encode_blocks(b, v, n_words))
out = bench("WHOLE v2 (B=8/2MiB)", f_all, blocks, n_valid)

# compare vs CPU host check on one block: decode bits count sanity
w, bits = out
lg(f"bits[:4] = {np.asarray(bits)[:4]}")
lg("done")
