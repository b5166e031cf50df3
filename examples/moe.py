"""Mixture-of-experts classifier (reference: examples/cpp/mixture_of_experts/
moe.cc — gate + topk + group_by + expert MLPs + aggregate, with the cache +
recompile-on-condition adaptivity)."""
import sys

sys.path.insert(0, ".")

import numpy as np

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.models import zoo


def main():
    cfg = FFConfig(batch_size=64)
    cfg.update_from_args()
    model = zoo.moe_mlp(batch_size=cfg.batch_size, num_experts=4, k=2,
                        in_dim=64, num_classes=10, config=cfg)
    model.compile(SGDOptimizer(lr=cfg.learning_rate),
                  LossType.LOSS_CATEGORICAL_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    rng = np.random.RandomState(cfg.seed)
    n = cfg.batch_size * 32
    y_idx = rng.randint(0, 10, n)
    centers = rng.randn(10, 64).astype(np.float32)
    x = centers[y_idx] + 0.3 * rng.randn(n, 64).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[y_idx]
    hist = model.fit({"input": x}, y, epochs=cfg.epochs, verbose=True)
    print(hist)


if __name__ == "__main__":
    main()
