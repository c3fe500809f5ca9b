"""Progressive versions of the pack kernel to find the failing construct."""

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

WIN = 384
B, NT = 2, 3072
T = NT // 1024
n_words = 1100
NWp = -(-n_words // 128) * 128 + WIN + 128

rng = np.random.default_rng(0)
nbits = rng.integers(0, 33, (B, NT)).astype(np.int32)
vals = rng.integers(0, 1 << 31, (B, NT)).astype(np.uint32)
v4 = jnp.asarray(vals.reshape(B, T, 8, 128))
n4 = jnp.asarray(nbits.reshape(B, T, 8, 128))


def make(level):
    def kernel(v_ref, nb_ref, w_ref, bits_ref, carry):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
            carry[0] = 0

        v = v_ref[0, 0].astype(jnp.uint32)
        nb = nb_ref[0, 0].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        x = nb
        for k in (1, 2, 4, 8, 16, 32, 64):
            x = x + jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 0)
        row_tot = jax.lax.broadcast_in_dim(x[:, 127], (8, 128), (0,))
        rsum = row_tot
        for k in (1, 2, 4):
            rsum = rsum + jnp.where(subl >= k, pltpu.roll(rsum, k, axis=0), 0)
        row_base = rsum - row_tot
        c0 = carry[0]
        incl = x + row_base
        off = c0 + incl - nb
        carry[0] = c0 + rsum[7, 0]
        bits_ref[0, 0, 0] = carry[0]
        if level == 1:
            return

        nbu = nb.astype(jnp.uint32)
        mask = jnp.where(
            nb >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << jnp.minimum(nbu, 31)) - jnp.uint32(1),
        )
        vm = v & mask
        sh_end = (off & 31) + nb
        sh_hi = jnp.where(sh_end <= 32, 32 - sh_end, 0).astype(jnp.uint32)
        hi = jnp.where(
            sh_end <= 32,
            vm << sh_hi,
            vm >> jnp.clip(sh_end - 32, 0, 31).astype(jnp.uint32),
        )
        lo = jnp.where(
            sh_end > 32,
            vm << jnp.clip(64 - sh_end, 0, 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        live = nb > 0
        hi = jnp.where(live, hi, jnp.uint32(0))
        lo = jnp.where(live, lo, jnp.uint32(0))
        w0 = off >> 5
        if level == 2:
            w_ref[0, 0, 0:128] = (hi ^ lo)[0, :] if False else w_ref[0, 0, 0:128]
            return

        head = (lane == 0) | (w0 != pltpu.roll(w0, 1, axis=1))
        xs, f = hi, head
        for k in (1, 2, 4, 8, 16, 32, 64):
            ok = lane >= k
            xk = pltpu.roll(xs, k, axis=1)
            fk = pltpu.roll(f, k, axis=1)
            xs = jnp.where(ok & ~f, xs ^ xk, xs)
            f = f | (ok & fk)
        nxt_w0 = pltpu.roll(w0, 127, axis=1)
        seg_last = (lane == 127) | (w0 != nxt_w0)
        hi_c = jnp.where(seg_last, xs, jnp.uint32(0))
        lo_c = jnp.where(seg_last, lo, jnp.uint32(0))
        if level == 3:
            return

        base_word = ((c0 + row_base) >> 5).astype(jnp.int32)
        abase = (base_word >> 7) << 7
        w0a = jnp.where(seg_last, w0 - abase, -1)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (8, WIN, 128), 1)
        onehot = (w0a[:, None, :] == jidx).astype(jnp.bfloat16)

        def planes_of(c):
            return jnp.stack(
                [
                    (c & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                    ((c >> 8) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                    ((c >> 16) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                    ((c >> 24) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
                ],
                axis=2,
            )

        planes = jnp.concatenate([planes_of(hi_c), planes_of(lo_c)], axis=2)
        res = jax.lax.dot_general(
            onehot,
            planes,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        resi = res.astype(jnp.int32).astype(jnp.uint32)
        hi_w = (
            resi[:, :, 0]
            | (resi[:, :, 1] << 8)
            | (resi[:, :, 2] << 16)
            | (resi[:, :, 3] << 24)
        )
        lo_w = (
            resi[:, :, 4]
            | (resi[:, :, 5] << 8)
            | (resi[:, :, 6] << 16)
            | (resi[:, :, 7] << 24)
        )
        lo_sh = jnp.concatenate(
            [jnp.zeros((8, 1), jnp.uint32), lo_w[:, : WIN - 1]], axis=1
        )
        W = hi_w ^ lo_sh
        if level == 4:
            return

        for g in range(8):
            a = (abase[g, 0] >> 7) * 128
            a = pl.multiple_of(a, 128)
            cur = w_ref[0, 0, pl.ds(a, WIN)]
            w_ref[0, 0, pl.ds(a, WIN)] = cur ^ W[g, :]

    return kernel


for level in [1, 2, 3, 4, 5]:
    try:
        t0 = time.time()
        words, bits = pl.pallas_call(
            make(level),
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, NWp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, NWp), jnp.uint32),
                jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(v4, n4)
        bb = np.asarray(bits)
        lg(f"level {level} OK {time.time()-t0:5.1f}s bits={bb.ravel()} want={nbits.sum(1)}")
    except Exception as e:
        lg(f"level {level} FAIL {type(e).__name__}: {str(e)[:300]}")

lg("done")
