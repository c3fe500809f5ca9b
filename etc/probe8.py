"""Bisect pack-kernel infrastructure: grid/specs/SMEM-out/scan combos."""

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

B, T = 2, 3
NWp = 1664
v4 = jnp.ones((B, T, 8, 128), jnp.int32)


def run(name, kernel, smem_out=False, scratch=True):
    outs = [
        jax.ShapeDtypeStruct((B, 1, NWp), jnp.uint32),
    ]
    ospecs = [
        pl.BlockSpec((1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    ]
    if smem_out:
        outs.append(jax.ShapeDtypeStruct((B, 1, 1), jnp.int32))
        ospecs.append(
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM)
        )
    try:
        t0 = time.time()
        out = pl.pallas_call(
            kernel,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 8, 128),
                    lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=tuple(ospecs) if len(ospecs) > 1 else ospecs[0],
            out_shape=tuple(outs) if len(outs) > 1 else outs[0],
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)] if scratch else [],
        )(v4)
        _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        lg(f"{name:28s} OK {time.time()-t0:5.1f}s")
    except Exception as e:
        lg(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:200]}")


# a: bare revisit-output grid + scratch + pl.when init
def k_a(v_ref, w_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        carry[0] = 0

    carry[0] = carry[0] + v_ref[0, 0][0, 0]


run("grid+scratch+when", k_a)


# b: + lane scan rolls
def k_b(v_ref, w_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        carry[0] = 0

    nb = v_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    x = nb
    for k in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 0)
    row_tot = jax.lax.broadcast_in_dim(x[:, 127], (8, 128), (0,))
    rsum = row_tot
    for k in (1, 2, 4):
        rsum = rsum + jnp.where(subl >= k, pltpu.roll(rsum, k, axis=0), 0)
    carry[0] = carry[0] + rsum[7, 0]


run("scan_rolls+scalar", k_b)


# c: like b but carry read BEFORE scans and added to a vector (off calc)
def k_c(v_ref, w_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        carry[0] = 0

    nb = v_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    x = nb
    for k in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 0)
    c0 = carry[0]
    off = c0 + x
    w_ref[0, 0, 0:128] = off[0, :].astype(jnp.uint32)
    carry[0] = c0 + x[7, 127]


run("carry_into_vector", k_c)


# d: dynamic-ds RMW loop over 8 rows (vector-extracted bases)
def k_d(v_ref, w_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
        carry[0] = 0

    nb = v_ref[0, 0]
    base = (nb * 3) % 8  # [8,128] vector
    for g in range(8):
        a = (base[g, 0] >> 7) * 128
        a = pl.multiple_of(a, 128)
        cur = w_ref[0, 0, pl.ds(a, 384)]
        w_ref[0, 0, pl.ds(a, 384)] = cur ^ jnp.uint32(g + 1)


run("rmw_loop8", k_d)

lg("done")
