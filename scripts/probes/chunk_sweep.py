import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time, numpy as np, jax, jax.numpy as jnp
print(jax.devices(), flush=True)
from dlrm_flexflow_tpu.ops.pallas.packed_update import (
    _prep_streams, _packed_apply, packed_num_packs, pick_chunk_packs,
)
from dlrm_flexflow_tpu.models.dlrm import kaggle_config
from dlrm_flexflow_tpu.autotune.machine import measure_dispatch_latency

cfg = kaggle_config()
big = [v for v in cfg.embedding_size if v > 8192]
d, k = 16, 65536
disp = measure_dispatch_latency()
print(f"dispatch {disp*1e3:.1f} ms; auto C = "
      f"{[pick_chunk_packs(v, d, k) for v in big]}", flush=True)
rng = np.random.default_rng(0)
rows_np = [rng.integers(0, v, size=(k,)).astype(np.int32) for v in big]
REPS = 30
for cmul, label in ((0.25, "C/4"), (0.5, "C/2"), (1.0, "C"), (2.0, "2C")):
    chunks = [
        max(256, min(4096, int(pick_chunk_packs(v, d, k) * cmul) // 256 * 256))
        for v in big
    ]
    tables = [
        jnp.zeros((packed_num_packs(v, d, c)[0], 128), jnp.bfloat16)
        for v, c in zip(big, chunks)
    ]
    rows = jnp.stack([jnp.asarray(r) for r in rows_np])
    g = [(jnp.ones((k, d), jnp.bfloat16), 1) for _ in big]
    streams = jax.jit(lambda rt: _prep_streams(rt, g, big, d, chunks))(rows)

    @jax.jit
    def run(ts):
        def body(c, j):
            outs = [
                _packed_apply(t, s[0], s[1], s[2], chunk_packs=cp, d=d,
                              compact=bool(s[3]), k_entries=k)
                for t, s, cp in zip(c, streams, chunks)
            ]
            return outs, 0.0
        c, _ = jax.lax.scan(body, list(ts), jnp.arange(REPS))
        return sum(t[0, 0].astype(jnp.float32) for t in c)

    _ = float(run(tables))
    t0 = time.perf_counter()
    _ = float(run(tables))
    dt = (time.perf_counter() - t0 - disp) / REPS
    tb = 2 * sum(t.size * t.dtype.itemsize for t in tables)
    print(f"{label:4s} chunks={sorted(set(chunks))} pass "
          f"{dt*1e3:7.3f} ms/iter {tb/dt/1e9:6.0f} GB/s", flush=True)
