"""Bisect which pallas primitive kills the Mosaic TPU compile."""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

lg(f"devices {jax.devices()}")

x8 = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)


def tryk(name, kernel, out_shape, *args, **kw):
    try:
        t0 = time.time()
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)
        r = np.asarray(jax.tree_util.tree_leaves(out)[0])
        lg(f"{name:28s} OK {time.time()-t0:5.1f}s sample={r.ravel()[:3]}")
        return r
    except Exception as e:
        lg(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


# 1. roll on lanes
tryk(
    "roll_lane",
    lambda i, o: o.__setitem__((...,), pltpu.roll(i[...], 1, axis=1)),
    jax.ShapeDtypeStruct((8, 128), jnp.int32),
    x8,
)

# 2. roll on sublanes
tryk(
    "roll_sublane",
    lambda i, o: o.__setitem__((...,), pltpu.roll(i[...], 1, axis=0)),
    jax.ShapeDtypeStruct((8, 128), jnp.int32),
    x8,
)


# 3. scalar extract from computed vector
def k_extract(i, o):
    v = i[...] * 2
    o[...] = jnp.full((8, 128), v[7, 0], jnp.int32)


tryk("scalar_extract", k_extract, jax.ShapeDtypeStruct((8, 128), jnp.int32), x8)


# 4. SMEM carry scratch + broadcast_in_dim
def k_bid(i, o):
    r = jax.lax.broadcast_in_dim(i[...][:, 127], (8, 128), (0,))
    o[...] = r


tryk("broadcast_in_dim", k_bid, jax.ShapeDtypeStruct((8, 128), jnp.int32), x8)


# 5. 3D iota + onehot + batched dot_general
def k_dot3(i, o):
    w0a = i[...] % 384
    jidx = jax.lax.broadcasted_iota(jnp.int32, (8, 384, 128), 1)
    onehot = (w0a[:, None, :] == jidx).astype(jnp.bfloat16)
    planes = jnp.ones((8, 128, 8), jnp.bfloat16)
    res = jax.lax.dot_general(
        onehot,
        planes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o[...] = res[:, :128, 0].astype(jnp.int32)


tryk("onehot_batched_dot", k_dot3, jax.ShapeDtypeStruct((8, 128), jnp.int32), x8)


# 6. dynamic ds RMW on lane dim of a [1,1,N] ref
def k_rmw(i, o):
    o[0, 0, :] = jnp.zeros((1152,), jnp.uint32)
    a = (i[0, 0] >> 7) * 128
    a = pl.multiple_of(a, 128)
    cur = o.at[0][0, pl.ds(a, 384)]
    o.at[0][0, pl.ds(a, 384)] = cur ^ jnp.uint32(7)


tryk(
    "dyn_ds_rmw",
    k_rmw,
    jax.ShapeDtypeStruct((1, 1, 1152), jnp.uint32),
    jnp.array([[300]], jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)


# 7. u32 variable shifts
def k_shift(i, o):
    v = i[...].astype(jnp.uint32)
    s = (i[...] % 31).astype(jnp.uint32)
    o[...] = ((v << s) | (v >> (jnp.uint32(31) - s))).astype(jnp.int32)


tryk("u32_var_shift", k_shift, jax.ShapeDtypeStruct((8, 128), jnp.int32), x8)

lg("done")
