import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time, numpy as np, jax
print(jax.devices(), flush=True)
from dlrm_flexflow_tpu import SGDOptimizer, FFConfig, LossType
from dlrm_flexflow_tpu.models.dlrm import mlperf_config, make_dlrm_model
from dlrm_flexflow_tpu.data.synthetic import random_batches

bs = 65536
cfg = mlperf_config(batch_size=bs)
ffc = FFConfig(batch_size=bs, compute_dtype="bfloat16")
ffc.table_dtype = "bfloat16"
ffc.host_tail_threshold = 1 << 20
ffc.host_tail_cap_frac = 0.25
model = make_dlrm_model(cfg, ffc)
model.compile(SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY, [])
feeds_np, labels_np = random_batches(cfg, bs * 2, seed=0, learnable=False,
                                     zipf=1.05)
batches = [({k: v[bs*j:bs*(j+1)] for k, v in feeds_np.items()},
            labels_np[bs*j:bs*(j+1)]) for j in range(2)]
T = {"routes": 0.0, "build_feeds": 0.0, "stage": 0.0, "device+read": 0.0,
     "apply_grads": 0.0}
ht = model._host_tail
orig_routes = model.compute_routes
orig_build = ht.build_feeds
orig_apply = ht.apply_grads
orig_stage = model._stage


def wrap(name, fn):
    def g(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] += time.perf_counter() - t0
        return out
    return g


model.compute_routes = wrap("routes", orig_routes)
ht.build_feeds = wrap("build_feeds", orig_build)
ht.apply_grads = wrap("apply_grads", orig_apply)
model._stage = wrap("stage", orig_stage)
orig_step = model._train_step


def step_w(*a, **k):
    t0 = time.perf_counter()
    out = orig_step(*a, **k)
    # include the g_host readback in the device bucket by forcing it here
    g_host = out[-1]
    g_host = {kk: np.asarray(v) for kk, v in g_host.items()}
    T["device+read"] += time.perf_counter() - t0
    return out[:-1] + (g_host,)


model._train_step = step_w

# compile + warm (2 steps, untimed buckets reset after)
for b in batches:
    model.train_batch(*b)
for k in T:
    T[k] = 0.0
N = 6
t0 = time.perf_counter()
for i in range(N):
    model.train_batch(*batches[i % 2])
total = time.perf_counter() - t0
print(f"steps={N} total {total/N*1e3:.0f} ms/step "
      f"({bs/(total/N):,.0f} ex/s)", flush=True)
for k, v in T.items():
    print(f"  {k:12s} {v/N*1e3:8.1f} ms/step ({v/total*100:4.1f}%)",
          flush=True)
other = total - sum(T.values())
print(f"  {'other(py)':12s} {other/N*1e3:8.1f} ms/step", flush=True)
print("touched_rows:", sum(e[0].touched_rows for e in ht.entries.values()),
      "drop:", model.host_tail_drop_fraction(), flush=True)
