"""Forward-gather design probe (round 3, VERDICT item 1).

Measures candidate implementations of the multi-table embedding forward
gather at kaggle dims (10 tables, V=1M, D=16 -> packed [131072, 128],
K=65536 lookups/table):

  A. XLA packed-pack gather, f32 tables (the round-2 production path)
  B. XLA packed-pack gather from a bf16 shadow table (half the bytes)
  C. XLA narrow [V, D] gather, f32 and bf16
  D. Pallas per-row DMA gather kernel at several pipeline depths
     (the "DMA-pipelined multi-table gather" design from PERF.md)

Timing protocol per PERF.md: one jitted lax.scan over pre-staged index
batches, host readback ends the timed region. Run on the real chip.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def timed_scan(fn, xs, steps, label):
    """fn: carry-free body mapping per-step x -> scalar. Returns us/step."""

    @jax.jit
    def run(xs):
        def body(acc, x):
            return acc + fn(x), 0.0

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    print(f"compiling {label}...", flush=True)
    out = float(run(xs))  # compile + warm
    t0 = time.perf_counter()
    out = float(run(xs))
    dt = (time.perf_counter() - t0) / steps * 1e6
    print(f"{label:55s} {dt:10.1f} us/step   (chk {out:.3e})")
    return dt


# ---------------------------------------------------------------- XLA paths

def xla_packed_gather(tables, idx_steps, rpp):
    def body(idx):
        acc = jnp.float32(0.0)
        for tb in tables:
            p = idx // rpp
            g = tb.at[p].get(mode="promise_in_bounds")
            acc += jnp.sum(g.astype(jnp.float32))
        return acc

    return body


def xla_narrow_gather(tables, idx_steps):
    def body(idx):
        acc = jnp.float32(0.0)
        for tb in tables:
            g = tb.at[idx].get(mode="promise_in_bounds")
            acc += jnp.sum(g.astype(jnp.float32))
        return acc

    return body


# ------------------------------------------------------- Pallas row-DMA path

def _dma_gather_kernel(rows_ref, table_hbm, out_ref, sems, *, tile, depth):
    t = pl.program_id(0)

    def get_dma(i):
        r = rows_ref[t * tile + i]
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(r, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems.at[jax.lax.rem(i, depth)],
        )

    def body(i, _):
        get_dma(i).start()

        @pl.when(i >= depth - 1)
        def _():
            get_dma(i - (depth - 1)).wait()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)

    def drain(i, _):
        get_dma(i).wait()
        return 0

    jax.lax.fori_loop(tile - (depth - 1), tile, drain, 0)


def dma_gather(table, rows, *, tile=2048, depth=16):
    k = rows.shape[0]
    assert k % tile == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile, LANES), lambda t, rows: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(
        functools.partial(_dma_gather_kernel, tile=tile, depth=depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, LANES), table.dtype),
    )(rows, table)


def pallas_dma_body(tables, rpp, tile, depth):
    def body(idx):
        acc = jnp.float32(0.0)
        for tb in tables:
            g = dma_gather(tb, idx // rpp, tile=tile, depth=depth)
            acc += jnp.sum(g.astype(jnp.float32))
        return acc

    return body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    rpp = LANES // args.dim
    pp = -(-args.vocab // rpp)
    pp = -(-pp // 1024) * 1024
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}", flush=True)
    # tables generated ON DEVICE: shipping hundreds of MB through the axon
    # tunnel takes minutes (PERF.md round-2 protocol note)
    keys = jax.random.split(jax.random.PRNGKey(0), args.tables)
    mk = jax.jit(lambda k, shape=(pp, LANES): 0.01 * jax.random.normal(k, shape))
    tables_f32 = [mk(k) for k in keys]
    tables_bf16 = [t.astype(jnp.bfloat16) for t in tables_f32]
    mkn = jax.jit(
        lambda k, shape=(args.vocab, args.dim): 0.01 * jax.random.normal(k, shape)
    )
    narrow_f32 = [mkn(k) for k in keys]
    narrow_bf16 = [t.astype(jnp.bfloat16) for t in narrow_f32]
    jax.block_until_ready(narrow_bf16)
    print("tables staged", flush=True)
    idx_steps = jnp.asarray(
        rng.randint(0, args.vocab, (args.steps, args.batch)).astype(np.int32)
    )
    per_row = 1e3 / (args.batch * args.tables)  # us/step -> ns/row

    def want(name):
        return not args.only or args.only in name

    results = {}
    if want("xla_packed_f32"):
        results["xla_packed_f32"] = timed_scan(
            xla_packed_gather(tables_f32, idx_steps, rpp), idx_steps,
            args.steps, f"A xla packed f32 x{args.tables}")
    if want("xla_packed_bf16"):
        results["xla_packed_bf16"] = timed_scan(
            xla_packed_gather(tables_bf16, idx_steps, rpp), idx_steps,
            args.steps, f"B xla packed bf16 x{args.tables}")
    if want("xla_narrow_f32"):
        results["xla_narrow_f32"] = timed_scan(
            xla_narrow_gather(narrow_f32, idx_steps), idx_steps,
            args.steps, f"C xla narrow f32 x{args.tables}")
    if want("xla_narrow_bf16"):
        results["xla_narrow_bf16"] = timed_scan(
            xla_narrow_gather(narrow_bf16, idx_steps), idx_steps,
            args.steps, f"C xla narrow bf16 x{args.tables}")
    for depth in (8, 16, 32):
        key = f"dma_d{depth}_f32"
        if want(key):
            results[key] = timed_scan(
                pallas_dma_body(tables_f32, rpp, 2048, depth), idx_steps,
                args.steps, f"D pallas row-dma depth={depth} f32")
    for depth in (16, 32):
        key = f"dma_d{depth}_bf16"
        if want(key):
            results[key] = timed_scan(
                pallas_dma_body(tables_bf16, rpp, 2048, depth), idx_steps,
                args.steps, f"D pallas row-dma depth={depth} bf16")

    print("\nns/row (aggregate over all tables):")
    for k, v in results.items():
        print(f"  {k:25s} {v * per_row:8.2f} ns/row")


if __name__ == "__main__":
    main()
