"""Micro-benchmark: Pallas kernels vs XLA paths on the real chip.

Run on TPU:  python scripts/microbench_pallas.py
Prints per-op timings; used to decide the op layer's default routing
(the framework analog of the reference's measure_operator_cost,
src/runtime/model.cu:20-64: measure real kernels, then decide).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from dlrm_flexflow_tpu.ffconst import ActiMode, AggrMode
from dlrm_flexflow_tpu.ops.embedding import embedding_bag
from dlrm_flexflow_tpu.ops.interaction import dot_interaction
from dlrm_flexflow_tpu.ops.pallas import (
    dense_pallas,
    dot_interaction_pallas,
    embedding_bag_pallas,
)
from dlrm_flexflow_tpu.ops.common import apply_activation


def timeit(fn, *args, reps=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)

    # --- dot interaction: DLRM kaggle shape (F=27, D=16) + mlperf (F=27,D=128)
    for b, f, d in [(8192, 27, 16), (8192, 27, 128), (65536, 27, 16)]:
        x = jnp.asarray(rng.randn(b, f, d).astype(np.float32))
        xla_fn = jax.jit(lambda x: dot_interaction(x, False, jnp.bfloat16))
        pal_fn = jax.jit(lambda x: dot_interaction_pallas(x, False, 256, False))
        t_xla = timeit(xla_fn, x)
        try:
            t_pal = timeit(pal_fn, x)
        except Exception as e:
            t_pal = float("nan")
            print("  pallas dot_interaction failed:", repr(e)[:200])
        print(f"dot_interaction B={b} F={f} D={d}: xla {t_xla:.1f}us pallas {t_pal:.1f}us")

    # --- embedding bag: big table, pooled bags
    for r, d, m, h in [(1_000_000, 16, 8192, 1), (1_000_000, 64, 8192, 32),
                       (10_000_000, 16, 212992, 1), (1_000_000, 128, 8192, 100)]:
        table = jnp.asarray(rng.randn(r, d).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, r, size=(m, h)).astype(np.int32))
        xla_fn = jax.jit(lambda t, i: embedding_bag(t, i, AggrMode.AGGR_MODE_SUM))
        pal_fn = jax.jit(
            lambda t, i: embedding_bag_pallas(t, i, AggrMode.AGGR_MODE_SUM, 16, False)
        )
        t_xla = timeit(xla_fn, table, idx, reps=20)
        try:
            t_pal = timeit(pal_fn, table, idx, reps=20)
        except Exception as e:
            t_pal = float("nan")
            print("  pallas embedding_bag failed:", repr(e)[:200])
        print(f"embedding_bag R={r} D={d} M={m} H={h}: xla {t_xla:.1f}us pallas {t_pal:.1f}us")

    # --- dense: DLRM top-MLP shapes
    for m, k, n in [(8192, 224, 512), (8192, 512, 256), (8192, 13, 512),
                    (8192, 2048, 4096)]:
        x = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(k, n) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        bias = jnp.asarray(rng.randn(n).astype(np.float32)).astype(jnp.bfloat16)
        xla_fn = jax.jit(
            lambda x, w, b: apply_activation(
                jnp.dot(x, w, preferred_element_type=jnp.float32) + b,
                ActiMode.AC_MODE_RELU,
            ).astype(jnp.bfloat16)
        )
        pal_fn = jax.jit(
            lambda x, w, b: dense_pallas(x, w, b, ActiMode.AC_MODE_RELU, 256, 256, 512, False)
        )
        t_xla = timeit(xla_fn, x, w, bias)
        try:
            t_pal = timeit(pal_fn, x, w, bias)
        except Exception as e:
            t_pal = float("nan")
            print("  pallas dense failed:", repr(e)[:200])
        print(f"dense M={m} K={k} N={n}: xla {t_xla:.1f}us pallas {t_pal:.1f}us")


if __name__ == "__main__":
    main()
