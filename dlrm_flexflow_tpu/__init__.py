"""dlrm_flexflow_tpu: a TPU-native distributed DLRM training framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capability surface of
facebookresearch/DLRM-FlexFlow (the Legion/CUDA reference): graph-builder
model API, per-op parallelization strategies discovered by a cost-model-guided
MCMC search, table-sharded embeddings with pooled all-to-all exchange,
data-parallel dense towers, and the full operator/training-service set.
"""

from .config import FFConfig, FFIterationConfig
from .ffconst import (
    ActiMode,
    AggrMode,
    CompMode,
    DataType,
    LossType,
    MetricsType,
    OperatorType,
    ParameterSyncType,
    PoolType,
)
from .core.ffmodel import FFModel
from .core.initializers import (
    ConstantInitializer,
    GlorotUniform,
    NormInitializer,
    UniformInitializer,
    ZeroInitializer,
)
from .core.tensor import ParameterSpec, TensorSpec
from .training.optimizer import (
    AdamOptimizer,
    RowWiseAdagradOptimizer,
    SGDOptimizer,
)

__version__ = "0.1.0"

__all__ = [
    "FFConfig",
    "FFIterationConfig",
    "FFModel",
    "ActiMode",
    "AggrMode",
    "CompMode",
    "DataType",
    "LossType",
    "MetricsType",
    "OperatorType",
    "ParameterSyncType",
    "PoolType",
    "TensorSpec",
    "ParameterSpec",
    "SGDOptimizer",
    "AdamOptimizer",
    "RowWiseAdagradOptimizer",
    "GlorotUniform",
    "ZeroInitializer",
    "UniformInitializer",
    "NormInitializer",
    "ConstantInitializer",
]
