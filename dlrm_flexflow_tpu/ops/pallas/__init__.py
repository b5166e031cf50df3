"""Pallas TPU kernels for the DLRM hot path.

The reference implements its hot ops as hand-written CUDA kernels
(reference: src/ops/embedding.cu:166-217 fused gather+pool / scatter-add,
src/ops/linear.cu:425-531 SGEMM + fused activation, src/ops/concat.cu
feature-interaction glue). The TPU-native equivalents live here as Pallas
kernels:

  - embedding_bag.py   : fused lookup+pool over an HBM-resident table with
                         double-buffered row DMA (+ custom VJP)
  - dot_interaction.py : fused pairwise-dot feature interaction with
                         lower-triangle extraction (MLPerf-DLRM "dot")
  - fused_mlp.py       : tiled bf16 matmul with f32 VMEM accumulator and
                         bias+activation epilogue

All kernels also run under Pallas interpret mode so the test suite exercises
them on CPU; routing is FFConfig.use_pallas -> resolve_use_pallas() ->
OpContext.use_pallas, consulted per op.
XLA already produces strong code for most of these (it fuses elementwise
epilogues into MXU matmuls); each kernel's docstring records when it wins
and the op layer picks per measurement, not by faith.
"""
from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when the default backend can compile Mosaic/TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def resolve_use_pallas(flag: str) -> bool:
    """Map an FFConfig.use_pallas value ('auto'|'on'|'off') to a bool."""
    if flag == "on":
        return True
    if flag == "off":
        return False
    return pallas_supported()


from .dot_interaction import dot_interaction_pallas  # noqa: E402
from .embedding_bag import embedding_bag_pallas  # noqa: E402
from .fused_mlp import dense_pallas  # noqa: E402
from .onehot_embedding import onehot_embedding_pallas  # noqa: E402

__all__ = [
    "pallas_supported",
    "resolve_use_pallas",
    "dot_interaction_pallas",
    "embedding_bag_pallas",
    "dense_pallas",
    "onehot_embedding_pallas",
]
