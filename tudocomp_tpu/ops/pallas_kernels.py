"""Pallas TPU kernels for the sequential inner loops of the encode path.

The Moffat/Katajainen Huffman passes are inherently sequential (509 tiny
steps over a 256-slot array). In plain XLA each step's dynamic read/write
becomes a gather/scatter (~100us apiece on TPU) or a 256-wide one-hot
select chain that compiles very slowly; in a Pallas kernel they are direct
VMEM accesses. One grid program per block; arrays are laid out [256, 1] so
dynamic indexing rides the sublane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (TPU backend)


def _moffat_lockstep_kernel(sigma_ref, keys_ref, a_ref):
    """Phases 1+2 of Moffat in-place code length calculation, all B blocks
    advancing in lockstep (one program; blocks ride the sublane dim, the
    256 array slots the lane dim). Dynamic per-block indices become
    one-hot lane masks — pure VPU selects, no serialization over blocks.
    """
    B = keys_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    m = sigma_ref[...]  # [B, 1]

    def rd(A, idx):
        return jnp.sum(
            jnp.where(lanes == idx, A, 0), axis=1, keepdims=True
        )

    def wr(A, idx, val, mask):
        return jnp.where((lanes == idx) & mask, val, A)

    A0 = keys_ref[...]
    A = wr(A0, 0, rd(A0, 0) + rd(A0, 1), m >= 2)

    def p1_body(t, carry):
        A, root, leaf = carry
        active = t < m - 1

        a_root = rd(A, root)
        a_leaf = rd(A, leaf)
        use1 = (leaf >= m) | (a_root < a_leaf)
        v1 = jnp.where(use1, a_root, a_leaf)
        A = wr(A, root, t, active & use1)
        root1 = jnp.where(use1, root + 1, root)
        leaf1 = jnp.where(use1, leaf, leaf + 1)
        A = wr(A, t, v1, active)

        a_root2 = rd(A, root1)
        a_leaf2 = rd(A, leaf1)
        use2 = (leaf1 >= m) | ((root1 < t) & (a_root2 < a_leaf2))
        v2 = jnp.where(use2, a_root2, a_leaf2)
        A = wr(A, root1, t, active & use2)
        root2 = jnp.where(use2, root1 + 1, root1)
        leaf2 = jnp.where(use2, leaf1, leaf1 + 1)
        A = wr(A, t, v1 + v2, active)

        root = jnp.where(active, root2, root)
        leaf = jnp.where(active, leaf2, leaf)
        return A, root, leaf

    A, _, _ = jax.lax.fori_loop(
        1,
        255,
        p1_body,
        (A, jnp.zeros((B, 1), jnp.int32), jnp.full((B, 1), 2, jnp.int32)),
    )

    A = wr(A, jnp.maximum(m - 2, 0), 0, m >= 2)

    def p2_body(j, A):
        nxt = m - 3 - j
        active = nxt >= 0
        nxt_c = jnp.maximum(nxt, 0)
        parent = rd(A, rd(A, nxt_c))
        return wr(A, nxt_c, parent + 1, active)

    A = jax.lax.fori_loop(0, 254, p2_body, A)
    a_ref[...] = A


def moffat_phase12(sorted_keys: jnp.ndarray, sigmas: jnp.ndarray, interpret=None):
    """Batched Moffat phases 1+2: [B, 256] sorted weights + [B] sigma ->
    [B, 256] arrays whose slots 0..sigma-2 hold internal-node depths."""
    B = sorted_keys.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _moffat_lockstep_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 256), jnp.int32),
        interpret=interpret,
    )(sigmas.astype(jnp.int32).reshape(B, 1), sorted_keys.astype(jnp.int32))
    return out
