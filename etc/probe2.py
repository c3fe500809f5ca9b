"""Stage-by-stage profile with REAL syncs (small fetches), plus MXU variants.

Every stage is its own tiny jit graph returning small checksums only, so
each remote compile is as fast as possible and each fetch is cheap.
"""

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

from tudocomp_tpu.ops import huffman_jax as hj
from tudocomp_tpu.ops.bitpack import pack_tokens_scanfree, pack_tokens

B = int(os.environ.get("PROBE_B", "64"))
bs = int(os.environ.get("PROBE_BS", str(1 << 18)))
n_words = (9 * bs + 4096 + 31) // 32
NB = B * bs


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    flat = jax.tree_util.tree_leaves(out)
    _ = [np.asarray(x) for x in flat]
    t_compile = time.time() - t0
    times = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        times.append(time.time() - t0)
    dt = min(times)
    lg(
        f"{name:20s} compile {t_compile:6.1f}s  run {dt*1e3:9.2f} ms  "
        f"{NB/dt/1e9:7.3f} GB/s"
    )
    return out


# --- on-device data gen ---
def gen(key):
    u = jax.random.uniform(key, (B, bs), jnp.float32, 1e-6, 1.0)
    v = jnp.floor(-40.0 * jnp.log(u)).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


f_gen = jax.jit(gen)
t0 = time.time()
blocks = f_gen(jax.random.PRNGKey(0))
blocks.copy_to_host_async() if hasattr(blocks, "copy_to_host_async") else None
_ = np.asarray(blocks[:1, :8]) if False else None
lg(f"gen compile+run {time.time()-t0:.1f}s (async)")
n_valid = jnp.full((B,), bs, jnp.int32)

# --- stage 1: histogram, scatter vs matmul ---
f_hist = jax.jit(lambda b, v: hj.block_histograms(b, v))
hists = bench("hist/scatter", f_hist, blocks, n_valid)


def hist_matmul(b):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    x = b.reshape(B, bs, 1)
    onehot = (x == iota.reshape(1, 1, 256)).astype(jnp.bfloat16)
    ones = jnp.ones((bs,), jnp.bfloat16)
    h = jnp.einsum(
        "i,bic->bc", ones, onehot, preferred_element_type=jnp.float32
    )
    return h.astype(jnp.int32)


f_histm = jax.jit(hist_matmul)
hists2 = bench("hist/matmul", f_histm, blocks)

# --- stage 2: code lengths (pallas moffat) ---
f_len = jax.jit(hj.code_lengths_batch)
lengths = bench("code_lengths", f_len, hists)

# --- stage 3: canonical codes ---
f_can = jax.jit(lambda ln: jax.vmap(hj.canonical_codes)(ln))
bench("canonical", f_can, lengths)


# --- stage 4: symbol lookup, gather vs matmul ---
def tok_gather(b, ln):
    def one(block, lengths):
        cw, numl, osym, sigma, longest = hj.canonical_codes(lengths)
        c = block.astype(jnp.int32)
        sym_vals = cw[c].astype(jnp.int32)
        sym_bits = lengths[c]
        return jnp.sum(sym_vals), jnp.sum(sym_bits)

    return jax.vmap(one)(b, ln)


f_tokg = jax.jit(tok_gather)
bench("lookup/gather", f_tokg, blocks, lengths)


def tok_matmul(b, ln):
    def one(block, lengths):
        cw, numl, osym, sigma, longest = hj.canonical_codes(lengths)
        # byte columns: 0..255 values are exact in bf16
        tbl = jnp.stack(
            [
                (cw & 0xFF).astype(jnp.bfloat16),
                ((cw >> 8) & 0xFF).astype(jnp.bfloat16),
                ((cw >> 16) & 0xFF).astype(jnp.bfloat16),
                ((cw >> 24) & 0xFF).astype(jnp.bfloat16),
                lengths.astype(jnp.bfloat16),
            ],
            axis=1,
        )  # [256, 5]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        onehot = (block.reshape(bs, 1) == iota).astype(jnp.bfloat16)
        res = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32)
        b0 = res[:, 0].astype(jnp.uint32)
        b1 = res[:, 1].astype(jnp.uint32)
        b2 = res[:, 2].astype(jnp.uint32)
        b3 = res[:, 3].astype(jnp.uint32)
        nb = res[:, 4].astype(jnp.int32)
        v = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        return jnp.sum(v.astype(jnp.int32)), jnp.sum(nb)

    return jax.vmap(one)(b, ln)


f_tokm = jax.jit(tok_matmul)
bench("lookup/matmul", f_tokm, blocks, lengths)


# --- stage 5: pack variants on synthetic tokens ---
NT = 521 + 4 * hj.MAX_LEN + bs  # mirrors table+symbol token count scale
key = jax.random.PRNGKey(1)


def mk_tokens(key):
    nb = jax.random.randint(key, (B, NT), 1, 13, jnp.int32)
    vals = jax.random.randint(key, (B, NT), 0, 4096, jnp.int32)
    return vals, nb


f_mk = jax.jit(mk_tokens)
vals, nb = f_mk(key)

def _sums(pair):
    w, t = pair
    return jnp.sum(w.astype(jnp.int32)), jnp.sum(t)


f_pack_sf = jax.jit(
    lambda v, n: _sums(jax.vmap(lambda a, b2: pack_tokens_scanfree(a, b2, n_words))(v, n))
)
bench("pack/scanfree", f_pack_sf, vals, nb)

f_pack_sc = jax.jit(
    lambda v, n: _sums(jax.vmap(lambda a, b2: pack_tokens(a, b2, n_words))(v, n))
)
bench("pack/scatter", f_pack_sc, vals, nb)

# --- cumsum alone ---
f_cs = jax.jit(lambda n: jnp.cumsum(n, axis=1)[:, -1])
bench("cumsum", f_cs, nb)

# --- whole pipeline for reference ---
f_all = jax.jit(
    lambda b, v: jax.tree_util.tree_map(
        jnp.sum, hj.encode_blocks(b, v, n_words)
    )
)
bench("WHOLE", f_all, blocks, n_valid)

lg("done")
