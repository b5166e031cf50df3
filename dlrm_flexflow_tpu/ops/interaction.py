"""DLRM pairwise dot-product feature interaction.

The reference only implements "cat" interaction and leaves "dot" as a TODO
(reference: examples/cpp/DLRM/dlrm.cc:49-65 — interact_features concats;
dot attention marked TODO at dlrm.cc:54). We implement both; dot is the
MLPerf-DLRM interaction: stack the (1 + num_tables) feature vectors [B, F, D],
compute Z = X X^T on the MXU, keep the strict lower triangle, and concatenate
with the dense feature. The Pallas fused version lives in
ops/pallas/dot_interaction.py; this op picks it on TPU.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


def dot_interaction(vectors, self_interaction: bool = False, compute_dtype=jnp.float32):
    """vectors: [B, F, D] stacked features -> [B, F*(F-1)/2] pairwise dots
    (or F*(F+1)/2 with self interaction)."""
    b, f, d = vectors.shape
    x = vectors.astype(compute_dtype)
    z = jnp.einsum("bfd,bgd->bfg", x, x, preferred_element_type=jnp.float32)
    offset = 0 if self_interaction else -1
    rows, cols = np.tril_indices(f, offset)
    flat = z.reshape(b, f * f)[:, rows * f + cols]
    return flat


class DotInteraction(Op):
    op_type = OperatorType.OP_DOT_INTERACTION

    def __init__(
        self,
        name: str,
        inputs: Sequence[TensorSpec],
        self_interaction: bool = False,
    ):
        """inputs: n tensors of identical [B, D]."""
        super().__init__(name, inputs)
        b, d = inputs[0].shape
        for t in inputs:
            assert tuple(t.shape) == (b, d), "all interaction features need equal [B,D]"
        f = len(inputs)
        self.self_interaction = self_interaction
        n_pairs = f * (f + 1) // 2 if self_interaction else f * (f - 1) // 2
        self._out((b, n_pairs), inputs[0].dtype)

    def forward(self, params, inputs, ctx):
        stacked = jnp.stack(inputs, axis=1)  # [B, F, D]
        b, f, d = stacked.shape
        up = getattr(ctx, "use_pallas", "off")
        # measured routing (scripts/microbench_pallas.py): the fused Pallas
        # kernel wins at D>=128 (mlperf-dim embeddings); at tiny D the padded
        # einsum is already dispatch-bound and XLA wins.
        if up == "on" or (up == "auto" and d >= 128 and b % 8 == 0):
            from .pallas.dot_interaction import dot_interaction_pallas

            block = b
            for cand in (256, 128, 64, 32, 16, 8):
                if b % cand == 0:
                    block = cand
                    break
            return [
                dot_interaction_pallas(stacked, self.self_interaction, block)
                .astype(inputs[0].dtype)
            ]
        return [
            dot_interaction(
                stacked, self.self_interaction, compute_dtype=ctx.compute_dtype
            ).astype(inputs[0].dtype)
        ]

    def cost_stats(self):
        b, d = self.inputs[0].shape
        f = len(self.inputs)
        return {
            "flops": 2.0 * b * f * f * d,
            "bytes": 4.0 * (b * f * d + b * self.outputs[0].shape[1]),
            "param_bytes": 0.0,
        }
