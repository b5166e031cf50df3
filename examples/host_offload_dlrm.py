import sys; sys.path.insert(0, ".")
import time
import numpy as np
from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig
from dlrm_flexflow_tpu.training.host_offload import HostOffloadTrainer, build_host_offload_dlrm
from dlrm_flexflow_tpu.data.synthetic import random_batches

# "terabyte-lite": mlperf-style D=128 dot-interaction DLRM whose two hot
# tables (40.8M + 3.07M rows = 22.5 GB f32) exceed the chip's HBM and live
# in host RAM
vocab = [40_790_948, 3_067_956, 405_282, 590_152, 12_973, 108, 36, 7_424]
f = len(vocab) + 1
cfg = DLRMConfig(
    sparse_feature_size=128,
    embedding_size=vocab,
    embedding_bag_size=1,
    mlp_bot=[13, 512, 256, 128],
    mlp_top=[f * (f - 1) // 2 + 128, 1024, 512, 256, 1],
    arch_interaction_op="dot",
    batch_size=2048,
)
ffc = FFConfig(batch_size=2048, compute_dtype="bfloat16")
t0 = time.time()
model, host_map = build_host_offload_dlrm(cfg, ffc, offload_threshold=1_000_000)
host_gb = sum(t.table.nbytes for t, _ in host_map.values()) / 1e9
print(f"hosted tables: {len(host_map)} ({host_gb:.1f} GB in host RAM), "
      f"init {time.time()-t0:.1f}s", flush=True)
trainer = HostOffloadTrainer(model, host_map, lr=0.01).compile(
    SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
    [MetricsType.METRICS_ACCURACY],
)
feeds, labels = random_batches(cfg, 2048 * 6, seed=0)
t0 = time.time()
loss0 = trainer.train_batch({k: v[:2048] for k, v in feeds.items()}, labels[:2048])
print(f"first step (compile): {time.time()-t0:.1f}s loss={loss0:.4f}", flush=True)
t0 = time.time()
steps = 10
for i in range(steps):
    sl = slice((i % 6) * 2048, (i % 6 + 1) * 2048)
    loss = trainer.train_batch({k: v[sl] for k, v in feeds.items()}, labels[sl])
dt = time.time() - t0
print(f"{steps} steps: {dt/steps*1e3:.0f} ms/step, {2048*steps/dt:,.0f} examples/s, "
      f"loss={loss:.4f}", flush=True)
