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


def _moffat_phase12_kernel(sigma_ref, keys_ref, a_ref):
    """Phases 1+2 of Moffat in-place code length calculation.

    sigma_ref: [B] scalar-prefetch (SMEM); keys_ref/a_ref: [1, 256, 1] VMEM
    (sorted ascending weights in; internal-node depths out, slots 0..m-2).
    """
    m = sigma_ref[pl.program_id(0)]

    a_ref[...] = keys_ref[...]

    def rd(i):
        return a_ref[0, pl.ds(jnp.minimum(i, 255), 1), :][0, 0]

    def wr(i, v):
        a_ref[0, pl.ds(jnp.minimum(i, 255), 1), :] = jnp.full(
            (1, 1), v, jnp.int32
        )

    # phase 1: weights -> parent pointers (A[0] += A[1]; two picks per t)
    @pl.when(m >= 2)
    def _():
        wr(0, rd(0) + rd(1))

    def p1_body(t, carry):
        root, leaf = carry
        active = t < m - 1

        a_root = rd(root)
        a_leaf = rd(leaf)
        use_root1 = (leaf >= m) | (a_root < a_leaf)
        v1 = jnp.where(use_root1, a_root, a_leaf)

        @pl.when(active & use_root1)
        def _():
            wr(root, t)

        root1 = jnp.where(use_root1, root + 1, root)
        leaf1 = jnp.where(use_root1, leaf, leaf + 1)

        a_root2 = rd(root1)
        a_leaf2 = rd(leaf1)
        use_root2 = (leaf1 >= m) | ((root1 < t) & (a_root2 < a_leaf2))
        v2 = jnp.where(use_root2, a_root2, a_leaf2)

        @pl.when(active & use_root2)
        def _():
            wr(root1, t)

        root2 = jnp.where(use_root2, root1 + 1, root1)
        leaf2 = jnp.where(use_root2, leaf1, leaf1 + 1)

        @pl.when(active)
        def _():
            wr(t, v1 + v2)

        root = jnp.where(active, root2, root)
        leaf = jnp.where(active, leaf2, leaf)
        return root, leaf

    jax.lax.fori_loop(1, 255, p1_body, (jnp.int32(0), jnp.int32(2)))

    # phase 2: parent pointers -> internal depths, right to left
    @pl.when(m >= 2)
    def _():
        wr(jnp.maximum(m - 2, 0), 0)

    def p2_body(j, _):
        nxt = m - 3 - j
        active = nxt >= 0
        nxt_c = jnp.maximum(nxt, 0)
        parent = rd(rd(nxt_c))

        @pl.when(active)
        def _():
            wr(nxt_c, parent + 1)

        return 0

    jax.lax.fori_loop(0, 254, p2_body, 0)


def moffat_phase12(sorted_keys: jnp.ndarray, sigmas: jnp.ndarray, interpret=None):
    """Batched Moffat phases 1+2: [B, 256] sorted weights + [B] sigma ->
    [B, 256] arrays whose slots 0..sigma-2 hold internal-node depths."""
    B = sorted_keys.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    keys3 = sorted_keys.astype(jnp.int32).reshape(B, 256, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 256, 1), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 256, 1), lambda i, s: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _moffat_phase12_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 256, 1), jnp.int32),
        interpret=interpret,
    )(sigmas.astype(jnp.int32), keys3)
    return out.reshape(B, 256)
