"""Forward-gather micro-benchmarks on the real chip.

Measures candidate implementations of the packed-table row gather (the
~5 ms/step forward pool at kaggle bs=65536; PERF.md round-2/3): the
current whole-pack+mask gather, slice-split variants (J interleaved
sub-gathers per table to raise DMA overlap), a bf16 shadow-table gather
(half the line bytes), and sorted-index variants. Prints ns/row per
variant so compile() mode selection and PERF.md stay measurement-driven.

Usage: python scripts/gather_microbench.py [--k 65536] [--tables 10]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_flexflow_tpu.ops.pallas.packed_update import (
    pack_table,
    packed_gather,
)


def timed(fn, *args, steps=30):
    """Scan-timed on device: per-dispatch tunnel latency excluded."""
    def body(c, _):
        out = fn(*args)
        return c + jnp.sum(out).astype(jnp.float32), 0.0

    @jax.jit
    def run():
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(steps))
        return acc

    run().block_until_ready()
    t0 = time.perf_counter()
    r = run().block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return dt, float(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=65536)
    ap.add_argument("--tables", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    k, t, v, d = args.k, args.tables, args.vocab, args.dim

    key = jax.random.PRNGKey(0)
    tables = [
        pack_table(jax.random.normal(jax.random.fold_in(key, i), (v, d)))
        for i in range(t)
    ]
    rows = [
        jnp.asarray(np.random.default_rng(i).integers(0, v, size=k), jnp.int32)
        for i in range(t)
    ]
    rows_sorted = [jnp.sort(r) for r in rows]
    n_rows = k * t

    def all_tables(gather_one):
        def f():
            return sum(
                jnp.sum(gather_one(tab, r).astype(jnp.float32))
                for tab, r in zip(tables, rows)
            )[None]
        return f

    results = {}

    # 1. current production path: whole-pack fetch + mask-sum select
    dt, _ = timed(all_tables(lambda tab, r: packed_gather(tab, r, d)),
                  steps=args.steps)
    results["pack (current)"] = dt

    # 2. slice-split: J interleaved sub-gathers per table
    for j in (2, 4, 8):
        def g(tab, r, j=j):
            outs = [
                packed_gather(tab, r[i * (k // j):(i + 1) * (k // j)], d)
                for i in range(j)
            ]
            return jnp.concatenate(outs)
        dt, _ = timed(all_tables(g), steps=args.steps)
        results[f"pack split x{j}"] = dt

    # 3. bf16 shadow tables (half the pack-line bytes)
    tables_bf = [tab.astype(jnp.bfloat16) for tab in tables]

    def g_bf():
        return sum(
            jnp.sum(packed_gather(tab, r, d).astype(jnp.float32))
            for tab, r in zip(tables_bf, rows)
        )[None]
    dt, _ = timed(g_bf, steps=args.steps)
    results["pack bf16 shadow"] = dt

    # 4. sorted indices (does XLA's gather benefit from locality?)
    def g_sorted():
        return sum(
            jnp.sum(packed_gather(tab, r, d).astype(jnp.float32))
            for tab, r in zip(tables, rows_sorted)
        )[None]
    dt, _ = timed(g_sorted, steps=args.steps)
    results["pack pre-sorted rows"] = dt

    # 5. narrow [K, D]-from-[B, D] permutation gather (the payload/unpermute
    #    cost class: update prep pays this per table)
    srcs = [jax.random.normal(jax.random.fold_in(key, 100 + i), (k, d))
            for i in range(t)]
    perms = [jnp.asarray(np.random.default_rng(50 + i).permutation(k),
                         jnp.int32) for i in range(t)]

    def g_perm():
        return sum(
            jnp.sum(s.at[p].get(mode="promise_in_bounds").astype(jnp.float32))
            for s, p in zip(srcs, perms)
        )[None]
    dt, _ = timed(g_perm, steps=args.steps)
    results["narrow perm [K,D]<-[K,D]"] = dt

    # 5b. wide [K, 128] permutation gather (round-2 expanded-stream class —
    #     the regression fix moved the expanded-mode payload back here)
    srcs_w = [jax.random.normal(jax.random.fold_in(key, 200 + i), (k, 128))
              .astype(jnp.bfloat16) for i in range(t)]

    def g_perm_w():
        return sum(
            jnp.sum(s.at[p].get(mode="promise_in_bounds").astype(jnp.float32))
            for s, p in zip(srcs_w, perms)
        )[None]
    dt, _ = timed(g_perm_w, steps=args.steps)
    results["wide perm [K,128]<-[K,128]"] = dt

    for j in (4,):
        def g_perm_s(j=j):
            out = []
            for s, p in zip(srcs, perms):
                out.extend(
                    jnp.sum(s.at[p[i * (k // j):(i + 1) * (k // j)]]
                            .get(mode="promise_in_bounds")
                            .astype(jnp.float32))[None]
                    for i in range(j)
                )
            return sum(out)
        dt, _ = timed(g_perm_s, steps=args.steps)
        results[f"narrow perm split x{j}"] = dt

    print(f"\nK={k} rows/table x {t} tables (D={d}, V={v}):")
    for name, dt in results.items():
        print(f"  {name:28s} {dt * 1e3:8.3f} ms  {dt / n_rows * 1e9:7.2f} ns/row")


if __name__ == "__main__":
    main()
