"""Per-phase step decomposition at REAL kaggle vocabs (round-4 runbook).

Round-2/3 decompositions used 10x 1M-row synthetic tables; the real
kaggle config's big tables total 33.7M rows (2.15 GB f32), so the packed
update kernel's full-table pass (read+write per step) is ~4.3 GB of HBM
traffic — potentially the LARGEST pool in the step, misattributed before.
This script times each phase standalone on the real chip:

  gathers      10 big-table forward gathers (packed whole-pack + mask)
  pass         update kernels only (pre-built streams)
  prep         stream prep only (sort + lane expand + payload permutation)
  update       prep + kernels end-to-end
  mlp          bot+top MLP fwd+bwd+SGD at bs=65536 bf16
  onehot       16 small-table one-hot fwd+bwd

each in f32 AND bf16 table storage where applicable (the bf16-tables
lever halves pass/gather HBM bytes).

Timing protocol (PERF.md): repeats inside ONE jitted lax.scan over
varying inputs, scalar readback ends the timed region; dispatch latency
subtracted via measure_dispatch_latency.
"""
from __future__ import annotations

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_flexflow_tpu.models.dlrm import kaggle_config
from dlrm_flexflow_tpu.ops.pallas.packed_update import (
    _prep_streams, _packed_apply, pack_table, packed_gather,
    packed_num_packs, pick_chunk_packs, packed_row_update_batched,
    set_selective,
)
from dlrm_flexflow_tpu.autotune.machine import measure_dispatch_latency


def draw_rows(rng, v, k, zipf=0.0):
    """Index stream: uniform or Zipf(a) over [0, v) (frequency-ordered ids,
    the real-Criteo shape — skew concentrates updates into few chunks)."""
    if zipf <= 0:
        return rng.integers(0, v, size=(k,)).astype(np.int32)
    r = rng.zipf(zipf, size=4 * k)
    r = r[r <= v][:k] - 1
    assert r.shape == (k,), "zipf draw underfilled; raise the oversample"
    return r.astype(np.int32)


def big_small_vocabs(thr=8192):
    cfg = kaggle_config()
    big = [v for v in cfg.embedding_size if v > thr]
    small = [v for v in cfg.embedding_size if v <= thr]
    return big, small


def timed(fn, args, repeats, disp, label, bytes_per_iter=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0 - disp) / repeats
    bw = f" {bytes_per_iter / dt / 1e9:7.0f} GB/s" if bytes_per_iter else ""
    print(f"{label:28s} {dt * 1e3:8.3f} ms/iter{bw}", flush=True)
    return dt


def phase_gathers(big, d, k, repeats, disp, dtype):
    rpp = 128 // d
    rng = np.random.default_rng(0)
    tables = [
        jnp.zeros((packed_num_packs(v, d, 256)[0], 128), dtype) for v in big
    ]
    idx = [jnp.asarray(rng.integers(0, v, size=(k,)), jnp.int32) for v in big]

    @jax.jit
    def run(ts, idxs):
        def body(c, j):
            acc = jnp.zeros((), jnp.float32)
            for t, i, v in zip(ts, idxs, big):
                rows = (i + j) % v
                acc += jnp.sum(packed_gather(t, rows, d).astype(jnp.float32))
            return c + acc, 0.0
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(repeats))
        return c

    nbytes = sum(k * 128 * jnp.dtype(dtype).itemsize for _ in big)
    return timed(run, (tables, idx), repeats, disp,
                 f"gathers[{dtype.__name__ if hasattr(dtype,'__name__') else dtype}]",
                 nbytes)


def phase_update(big, d, k, repeats, disp, dtype, kernels_only,
                 zipf=0.0, label_extra=""):
    rng = np.random.default_rng(0)
    chunks = [pick_chunk_packs(v, d, k) for v in big]
    tables = [
        jnp.zeros((packed_num_packs(v, d, c)[0], 128), dtype)
        for v, c in zip(big, chunks)
    ]
    rows = [jnp.asarray(draw_rows(rng, v, k, zipf)) for v in big]
    g = [(jnp.ones((k, d), jnp.bfloat16), 1) for _ in big]
    tbytes = 2 * sum(t.size * t.dtype.itemsize for t in tables)

    if kernels_only:
        rows_tk = jnp.stack(rows)
        streams = jax.jit(
            lambda rt: _prep_streams(rt, g, big, d, chunks)
        )(rows_tk)

        @jax.jit
        def run(ts):
            def body(c, j):
                outs = [
                    _packed_apply(t, s[0], s[1], s[2], chunk_packs=cp, d=d,
                                  compact=bool(s[3]), k_entries=k)
                    for t, s, cp in zip(c, streams, chunks)
                ]
                return outs, 0.0
            c, _ = jax.lax.scan(body, list(ts), jnp.arange(repeats))
            # consume EVERY table so jax's scan DCE can't drop carries
            return sum(t[0, 0].astype(jnp.float32) for t in c)

        return timed(run, (tables,), repeats, disp,
                     f"pass[{jnp.dtype(dtype).name}]" + label_extra, tbytes)

    @jax.jit
    def run(ts, rws):
        def body(c, j):
            rl = [(r + j) % v for r, v in zip(rws, big)]
            outs = packed_row_update_batched(
                list(c), rl, g, big, d, chunk_packs=chunks)
            return outs, 0.0
        c, _ = jax.lax.scan(body, list(ts), jnp.arange(repeats))
        return sum(t[0, 0].astype(jnp.float32) for t in c)

    return timed(run, (tables, rows), repeats, disp,
                 f"update[{jnp.dtype(dtype).name}]" + label_extra, tbytes)


def phase_prep(big, d, k, repeats, disp):
    rng = np.random.default_rng(0)
    chunks = [pick_chunk_packs(v, d, k) for v in big]
    rows = jnp.stack([
        jnp.asarray(rng.integers(0, v, size=(k,)), jnp.int32) for v in big
    ])
    g = [(jnp.ones((k, d), jnp.bfloat16), 1) for _ in big]

    @jax.jit
    def run(rows_tk):
        def body(c, j):
            streams = _prep_streams((rows_tk + j) % jnp.asarray(
                big, jnp.int32)[:, None], g, big, d, chunks)
            # consume full streams so XLA can't slice through the prep
            acc = sum(jnp.sum(s[2].astype(jnp.float32))
                      + jnp.sum(s[0]).astype(jnp.float32)
                      for s in streams)
            return c + acc, 0.0
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(repeats))
        return c

    return timed(run, (rows,), repeats, disp, "prep(device-sort)")


def phase_mlp(k, repeats, disp):
    cfg = kaggle_config()
    dims_bot, dims_top = cfg.mlp_bot, cfg.mlp_top
    rng = np.random.default_rng(0)

    def init(dims):
        return [
            (jnp.asarray(rng.normal(0, 0.1, (a, b)), jnp.float32),
             jnp.zeros((b,), jnp.float32))
            for a, b in zip(dims[:-1], dims[1:])
        ]

    pb, pt = init(dims_bot), init(dims_top)
    x = jnp.asarray(rng.normal(0, 1, (k, dims_bot[0])), jnp.bfloat16)
    xt = jnp.asarray(rng.normal(0, 1, (k, dims_top[0])), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 2, (k, 1)), jnp.bfloat16)

    def fwd(params, x):
        h = x
        for w, b in params:
            h = jnp.maximum(
                jnp.dot(h, w.astype(jnp.bfloat16)) + b.astype(jnp.bfloat16),
                0)
        return h

    def loss(ps, x, xt, y):
        hb = fwd(ps[0], x)
        # feed the bot output into the top input (like the DLRM concat)
        # so neither MLP can be dead-code-eliminated
        xt = xt.at[:, : hb.shape[1]].add(hb)
        ht = fwd(ps[1], xt)
        return jnp.mean(
            (ht.astype(jnp.float32) - y.astype(jnp.float32)) ** 2
        )

    @jax.jit
    def run(ps, x, xt, y):
        def body(c, j):
            l, gr = jax.value_and_grad(loss)(c, x, xt, y)
            new = jax.tree.map(lambda p, g: p - 0.01 * g, c, gr)
            return new, l
        c, _ = jax.lax.scan(body, ps, jnp.arange(repeats))
        return sum(w[0, 0] for g in c for (w, b) in g)

    return timed(run, ((pb, pt), x, xt, y), repeats, disp, "mlp fwd+bwd+sgd")


def phase_onehot(small, d, k, repeats, disp):
    rng = np.random.default_rng(0)
    tables = [jnp.asarray(rng.normal(0, 0.1, (v, d)), jnp.float32)
              for v in small]
    idx = [jnp.asarray(rng.integers(0, v, (k,)), jnp.int32) for v in small]

    def fwd(ts, idxs, j):
        acc = jnp.zeros((), jnp.float32)
        for t, i, v in zip(ts, idxs, small):
            oh = jax.nn.one_hot((i + j) % v, v, dtype=jnp.bfloat16)
            e = jnp.dot(oh, t.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc += jnp.sum(e)
        return acc

    @jax.jit
    def run(ts, idxs):
        def body(c, j):
            l, gr = jax.value_and_grad(
                lambda tt: fwd(tt, idxs, j))(list(c))
            new = [t - 0.01 * g for t, g in zip(c, gr)]
            return new, l
        c, _ = jax.lax.scan(body, list(ts), jnp.arange(repeats))
        return sum(t[0, 0].astype(jnp.float32) for t in c)

    return timed(run, (tables, idx), repeats, disp, "onehot x16 fwd+bwd+sgd")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--allow-cpu", action="store_true")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="Zipf exponent for update indices (0 = uniform)")
    ap.add_argument("--phases", default="all")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if not args.allow_cpu:
        assert jax.devices()[0].platform == "tpu"
    big, small = big_small_vocabs()
    print(f"big tables: {len(big)} ({sum(big) / 1e6:.1f}M rows, "
          f"{sum(big) * 16 * 4 / 1e9:.2f} GB f32); small: {len(small)}")
    disp = measure_dispatch_latency()
    print(f"dispatch latency: {disp * 1e3:.2f} ms", flush=True)
    k, d = args.batch, 16
    ph = args.phases.split(",") if args.phases != "all" else [
        "gathers", "pass", "update", "prep", "mlp", "onehot"]
    r = args.repeats
    if "gathers" in ph:
        phase_gathers(big, d, k, r, disp, jnp.float32)
        phase_gathers(big, d, k, r, disp, jnp.bfloat16)
    if "pass" in ph:
        phase_update(big, d, k, r, disp, jnp.float32, kernels_only=True,
                     zipf=args.zipf)
        phase_update(big, d, k, r, disp, jnp.bfloat16, kernels_only=True,
                     zipf=args.zipf)
    if "selective" in ph or "pass" in ph:
        # touched-chunk dispatch A/B (round 5): under Zipf most chunks of
        # a 10M-row table receive no entries — the selective grid parks the
        # idle steps on one untouched chunk, so pass time tracks TOUCHED
        # chunk bytes, not vocab. Uniform bs=65536 touches everything
        # (selective ~= full); quote both.
        for z in sorted({0.0, args.zipf, 1.05}):
            for sel in (True, False):
                set_selective(sel)
                phase_update(
                    big, d, k, r, disp, jnp.bfloat16, kernels_only=True,
                    zipf=z,
                    label_extra=f" sel={'on' if sel else 'off'} zipf={z}",
                )
        set_selective(True)
    if "update" in ph:
        phase_update(big, d, k, r, disp, jnp.float32, kernels_only=False,
                     zipf=args.zipf)
    if "prep" in ph:
        phase_prep(big, d, k, r, disp)
    if "mlp" in ph:
        phase_mlp(k, r, disp)
    if "onehot" in ph:
        phase_onehot(small, d, k, r, disp)


if __name__ == "__main__":
    main()
