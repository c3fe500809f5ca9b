"""Pack-v2 building blocks on TPU: Hillis-Steele scans, two-level
histogram matmul, and (the key unknown) vectorized VMEM gather in Pallas.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t_start = time.time()


def lg(msg):
    print(f"[{time.time()-t_start:7.1f}s] {msg}", flush=True)


import numpy as np
import jax
import jax.numpy as jnp

lg(f"devices {jax.devices()}")

B = int(os.environ.get("PROBE_B", "64"))
bs = int(os.environ.get("PROBE_BS", str(1 << 18)))
NT = 393 + bs
n_words = (9 * bs + 4096 + 31) // 32
NB = B * bs


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
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


def mk(key):
    nb = jax.random.randint(key, (B, NT), 1, 13, jnp.int32)
    vals = jax.random.randint(key, (B, NT), 0, 4096, jnp.int32).astype(jnp.uint32)
    return vals, nb


vals, nb = jax.jit(mk)(jax.random.PRNGKey(1))

LOG = max(1, (NT - 1).bit_length())


def hillis_cumsum(x):
    # inclusive +-scan along axis 1, static shifts
    for k in range(LOG):
        s = 1 << k
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
    return x


f_cs = jax.jit(lambda n: hillis_cumsum(n)[:, -1])
bench("hillis_cumsum", f_cs, nb)

f_cs2 = jax.jit(lambda n: jnp.cumsum(n, axis=1)[:, -1])
bench("jnp.cumsum", f_cs2, nb)


def hillis_xor(x):
    for k in range(LOG):
        s = 1 << k
        x = x ^ jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
    return x


f_xs = jax.jit(lambda v: hillis_xor(v)[:, -1])
bench("hillis_xorscan", f_xs, vals)

# two-level histogram of off>>5 via matmul: H[hi, lo]
NHI = (n_words + 1 + 255) // 256


def hist2(nbits):
    ends = jnp.cumsum(nbits, axis=1)
    off = ends - nbits
    w0 = (off >> 5).astype(jnp.int32)
    whi = w0 >> 8
    wlo = w0 & 255
    oh_hi = (
        whi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, NHI), 2)
    ).astype(jnp.bfloat16)
    oh_lo = (
        wlo[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    ).astype(jnp.bfloat16)
    H = jnp.einsum(
        "bth,btl->bhl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    )
    cnt = H.reshape(B, NHI * 256).astype(jnp.int32)
    b = jnp.cumsum(cnt, axis=1) - 1  # b[w] = last token with off < 32w... check
    return b[:, : n_words + 1]


f_h2 = jax.jit(hist2)
bench("hist2_matmul", f_h2, nb)

# pallas vectorized VMEM gather: out[i] = S[idx[i]]
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NW = n_words + 1


def gather_kernel(s_ref, idx_ref, out_ref):
    out_ref[0, :] = s_ref[0, :][idx_ref[0, :]]


def pallas_gather(S, idx):
    return pl.pallas_call(
        gather_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S.shape[1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, idx.shape[1]), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, idx.shape[1]), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, idx.shape[1]), S.dtype),
    )(S, idx)


try:
    S = jax.jit(hillis_xor)(vals)
    idx = jax.jit(lambda n: jnp.clip(hist2(n), 0, NT - 1))(nb)
    f_pg = jax.jit(lambda s, i: pallas_gather(s, i))
    out = bench("pallas_gather", f_pg, S, idx)
except Exception as e:
    lg(f"pallas_gather FAILED: {type(e).__name__}: {str(e)[:500]}")

lg("done")
