"""Fused pairwise dot-product feature interaction (Pallas TPU kernel).

The XLA path (ops/interaction.py) computes Z = einsum('bfd,bgd->bfg') and
then gathers the strict lower triangle: for DLRM shapes (F≈27, D≈16) the
batched matmul pads each 27x16 operand to MXU tiles (128x128) — >20x wasted
systolic-array occupancy — and the triangle gather is a separate HBM
round-trip of the full [B, F, F] tensor.

This kernel keeps one batch tile of stacked features [BT, F, D] in VMEM and
emits only the [BT, n_pairs] triangle, never materializing [B, F, F] in HBM.
The pairwise dots are computed on the VPU as F elementwise
multiply-and-reduce sweeps (work = B*F^2*D MACs, exactly the useful flops:
for these tiny F,D the VPU beats a padded MXU launch), with the whole fusion
saving the Z round-trip. Backward is expressed in terms of the same kernel's
residuals via jax.custom_vjp: dX[:, i] = sum_j Z'[:, i, j] X[:, j] which we
compute as one XLA einsum over the scattered-back triangle (cheap, and grads
flow through the dense towers anyway).

Reference analog: the interaction that DLRM-FlexFlow leaves as TODO
(examples/cpp/DLRM/dlrm.cc:54); kernel-ownership style follows its CUDA ops
(src/ops/concat.cu custom glue kernels).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_layout(f: int, self_interaction: bool):
    """Static (row, col, out-offset-per-i) layout of the kept triangle."""
    offset = 0 if self_interaction else -1
    rows, cols = np.tril_indices(f, offset)
    n_pairs = len(rows)
    return rows, cols, n_pairs


def _interaction_kernel(x_ref, out_ref, *, f, d, n_pairs, self_interaction):
    """x_ref: [BT, F, D] VMEM; out_ref: [BT, n_pairs] VMEM."""
    x = x_ref[:].astype(jnp.float32)  # [BT, F, D]
    off = 0
    # Static unroll over anchor feature i; each sweep is one VPU
    # multiply + reduce producing the i-th triangle row block.
    for i in range(f):
        take = i + 1 if self_interaction else i
        if take == 0:
            continue
        # [BT, take, D] * [BT, 1, D] -> sum_D -> [BT, take]
        prod = x[:, :take, :] * x[:, i : i + 1, :]
        s = jnp.sum(prod, axis=2)
        out_ref[:, off : off + take] = s.astype(out_ref.dtype)
        off += take
    assert off == n_pairs


@functools.partial(
    jax.jit, static_argnames=("self_interaction", "block_b", "interpret")
)
def _interaction_fwd(x, self_interaction=False, block_b=256, interpret=False):
    b, f, d = x.shape
    _, _, n_pairs = _pair_layout(f, self_interaction)
    bt = min(block_b, b)
    if b % bt != 0:
        # pad the batch to a block multiple and slice the result (same
        # convention as the sibling embedding_bag/onehot kernels)
        b_pad = (b + bt - 1) // bt * bt
        x_pad = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        return _interaction_fwd(x_pad, self_interaction, block_b, interpret)[:b]
    kernel = functools.partial(
        _interaction_kernel, f=f, d=d, n_pairs=n_pairs,
        self_interaction=self_interaction,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bt, n_pairs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pairs), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * f * f * d),
            bytes_accessed=int(4 * (b * f * d + b * n_pairs)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def dot_interaction_pallas(x, self_interaction=False, block_b=256, interpret=False):
    """x: [B, F, D] stacked features -> [B, n_pairs] strict-lower-triangle
    pairwise dots (or full lower triangle with self_interaction)."""
    return _interaction_fwd(x, self_interaction, block_b, interpret)


def _fwd(x, self_interaction, block_b, interpret):
    return _interaction_fwd(x, self_interaction, block_b, interpret), x


def _bwd(self_interaction, block_b, interpret, x, g):
    b, f, d = x.shape
    rows, cols, _ = _pair_layout(f, self_interaction)
    # out_p = x[:,r_p] . x[:,c_p]  =>  dx = (Zg + Zg^T) x  where Zg is the
    # triangle gradient scattered back to [B, F, F]. The diagonal (r==c,
    # self_interaction) lands on both terms, giving the correct 2 g x_i.
    zfull = jnp.zeros((b, f, f), jnp.float32)
    zfull = zfull.at[:, rows, cols].add(g.astype(jnp.float32))
    zg = zfull + jnp.swapaxes(zfull, 1, 2)
    dx = jnp.einsum(
        "bfg,bgd->bfd", zg, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return (dx.astype(x.dtype),)


dot_interaction_pallas.defvjp(_fwd, _bwd)
