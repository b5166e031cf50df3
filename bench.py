"""Benchmark driver: DLRM training throughput (examples/sec).

Protocol mirrors the reference's measurement (reference:
examples/cpp/DLRM/dlrm.cc:150-194 — warmup epoch, fence-bracketed timer,
THROUGHPUT = samples/s): warmup steps to compile + settle, then timed steps
on device-resident batches (input pipeline measured separately so the number
is the compute+exchange path, like the reference's ZCM-staged batches).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Round-1 anchor measured on 1x TPU v5e (this framework, first working build):
# kaggle-config DLRM, bf16 compute, SGD, batch 8192, sparse embedding updates
# -> 902,918 examples/s. Later rounds are measured against this so
# vs_baseline tracks progression; the reference repo publishes no numbers
# (BASELINE.md).
BASELINE_EXAMPLES_PER_SEC = 900_000.0
# forward-only (serving) anchor measured alongside (PERF.md)
INFER_BASELINE_EXAMPLES_PER_SEC = 4_400_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle",
                    choices=["tiny", "kaggle", "mlperf", "mlperf-lite",
                             "mlperf-full", "summit", "summit-large"])
    # mlperf-full: the UNCLIPPED 26-table Terabyte config (227M/293M-row
    # vocabs) on one chip — host-tail offload keeps a hot prefix per huge
    # table in HBM and serves cold rows from the demand-allocated host
    # store (parallel/host_tail.py); indices are Zipf(1.05) so the skew
    # matches frequency-ordered Criteo ids
    ap.add_argument("--host-tail-threshold", type=int, default=0,
                    help="device hot-prefix rows for tables above it "
                         "(0 = auto: 2^20 for mlperf-full, off otherwise)")
    # default batch is the best-known single-chip config (PERF.md sweep);
    # --reference-batch also reports the bs=8192 row for cross-round
    # comparability
    ap.add_argument("--batch-size", type=int, default=65536)
    ap.add_argument("--packed-tables", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--packed-gather-mode", default="auto",
                    choices=["auto", "pack", "subpack"],
                    help="packed row-gather implementation (auto = the "
                         "machine file's calibrated winner)")
    ap.add_argument("--packed-stream-mode", default="auto",
                    choices=["auto", "expanded", "compact"],
                    help="packed update-stream format (auto = the machine "
                         "file's calibrated winner)")
    ap.add_argument("--host-routing", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="attach host-precomputed packed-update routing "
                         "metadata to each batch (the production input "
                         "pipeline contract: index-derived, computed off "
                         "the critical path by ffdata's threaded sort; "
                         "--no-host-routing measures the on-device sort)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="Zipf exponent for the synthetic index stream "
                         "(0 = uniform). Real Criteo ids are frequency-"
                         "ordered ~Zipf(1.05); skew concentrates updates "
                         "into few chunks, which the selective packed "
                         "dispatch exploits. host-tail configs default "
                         "to 1.05 regardless")
    ap.add_argument("--packed-selective", default="on",
                    choices=["on", "off"],
                    help="touched-chunk-only update dispatch (off = "
                         "round-4 full-table pass, for A/B)")
    ap.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"],
                    help="adam measures the lazy-Adam packed path "
                         "(m/v side pools maintained by the same kernel)")
    ap.add_argument("--mesh", action="store_true", help="use all devices with hybrid plan")
    ap.add_argument("--mode", default="train", choices=["train", "infer"],
                    help="train step throughput or forward-only (serving)")
    ap.add_argument("--onehot-threshold", type=int, default=8192,
                    help="vocab bound for the one-hot matmul path; 0 sends "
                         "every table through the packed gather+kernel "
                         "(measurable: the 16 kaggle small tables are "
                         "~1.16 ms of forward as one-hot matmuls)")
    ap.add_argument("--onehot-packed-threshold", type=int, default=0,
                    help="mid-band vocab bound for the PACKED one-hot "
                         "matmul (onehot[B, V/rpp] @ packed[V/rpp, 128], "
                         "all 128 MXU lanes live; dense [P, 128] grads — "
                         "no gather/update stream for those tables); "
                         "0 = off")
    ap.add_argument("--table-dtype", default="auto",
                    choices=["auto", "float32", "bfloat16", "float16",
                             "int8"],
                    help="embedding-table storage dtype. train: bfloat16 "
                         "stores packed tables bf16 (halves forward-gather "
                         "+ update-pass HBM traffic; f32 kernel accumulate, "
                         "f32 optimizer pools). infer: bf16/f16/int8 "
                         "quantize serving tables (int8 adds per-row "
                         "scales). auto = bfloat16 for train (measured "
                         "+12.9% at kaggle bs=65536, identical 30-step "
                         "loss; PERF.md round 4), float32 (unquantized) "
                         "for infer")
    args = ap.parse_args()
    if args.quick:
        args.steps, args.warmup = 10, 3

    # Fail fast instead of hanging forever when the device backend is
    # unreachable (e.g. a TPU-tunnel outage): probe device init in a
    # subprocess with a timeout. Skipped when jax is already imported
    # in-process (tests configure the CPU backend first) or via env.
    import os
    import subprocess

    if "jax" not in sys.modules and not os.environ.get("BENCH_SKIP_PROBE"):
        try:
            # DEVNULL, not pipes: a hung backend helper process would keep
            # an inherited pipe open and stall the post-kill read forever
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            print(f"bench: device backend unreachable ({type(e).__name__}); "
                  "is the TPU tunnel up?", file=sys.stderr)
            sys.exit(3)

    import jax

    from dlrm_flexflow_tpu import SGDOptimizer, FFConfig, LossType, MetricsType
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import (
        kaggle_config,
        make_dlrm_model,
        mlperf_config,
        mlperf_lite_config,
        summit_config,
        summit_large_config,
        tiny_config,
    )

    cfg = {
        "tiny": tiny_config,
        "kaggle": kaggle_config,
        "mlperf": lambda batch_size: mlperf_config(batch_size=batch_size, num_tables=8),
        "mlperf-lite": mlperf_lite_config,
        "mlperf-full": mlperf_config,
        "summit": summit_config,
        "summit-large": summit_large_config,
    }[args.config](batch_size=args.batch_size)

    if args.config == "mlperf-full":
        if args.mode != "train":
            # the unclipped 227M/293M-row vocabs only fit via the host-tail
            # split, and the host-tail bench measures training (per-step
            # host work); serving this config needs multi-chip sharding
            ap.error("mlperf-full supports --mode train only "
                     "(host-tail offload; see PERF.md)")
        if args.host_tail_threshold == 0:
            args.host_tail_threshold = 1 << 20
    ffc = FFConfig(batch_size=args.batch_size, compute_dtype=args.compute_dtype)
    explicit_table_dtype = args.table_dtype != "auto"
    if args.table_dtype == "auto":
        args.table_dtype = "bfloat16" if args.mode == "train" else "float32"
    if args.mode == "train" and args.table_dtype != "float32":
        # training-time bf16 packed-table storage (config.table_dtype);
        # int8/f16 remain serving-only quantization formats
        if args.table_dtype != "bfloat16":
            ap.error("train supports --table-dtype float32|bfloat16")
        ffc.table_dtype = args.table_dtype
    ffc.packed_tables = args.packed_tables
    ffc.packed_gather_mode = args.packed_gather_mode
    ffc.packed_stream_mode = args.packed_stream_mode
    ffc.packed_selective = args.packed_selective
    ffc.onehot_embedding_threshold = args.onehot_threshold
    ffc.onehot_packed_threshold = args.onehot_packed_threshold
    if args.host_tail_threshold > 0:
        ffc.host_tail_threshold = args.host_tail_threshold
        # expected Zipf(1.05) tail traffic at hot=2^20 is ~20% of lookups;
        # cap 25% of batch*bag leaves slack without bloating the exchange
        ffc.host_tail_cap_frac = 0.25
    model = make_dlrm_model(cfg, ffc)

    mesh = plan = None
    n_dev = len(jax.devices())
    if args.mesh and n_dev > 1:
        from dlrm_flexflow_tpu.parallel.mesh import make_mesh
        from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

        mesh = make_mesh()
        plan = dlrm_hybrid_plan()

    if args.optimizer == "adam":
        from dlrm_flexflow_tpu import AdamOptimizer

        optimizer = AdamOptimizer(alpha=0.001)
    else:
        optimizer = SGDOptimizer(lr=0.01)
    model.compile(
        optimizer,
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
        mesh=mesh,
        plan=plan,
    )

    # Resolve what ACTUALLY engaged (ADVICE r4): table_dtype applies only
    # where an op took bf16 storage (packed single tables, packed sharded
    # pools); if the packed path gated off (CPU, batch volume below
    # packed_min_rows, unsupported optimizer), the bench would otherwise
    # report a bf16 configuration it never measured.
    packed_engaged = any(
        getattr(op, "packed", False)
        or getattr(getattr(op, "layout", None), "packed_pool", False)
        for op in model.graph.compute_ops
    )
    dtype_engaged = any(
        getattr(op, "table_dtype", None) is not None
        for op in model.graph.compute_ops
    )
    effective_table_dtype = args.table_dtype
    if args.mode == "train" and args.table_dtype == "bfloat16" \
            and not dtype_engaged:
        msg = ("--table-dtype bfloat16 requested but no op engaged bf16 "
               "table storage (packed path off: backend/--packed-tables/"
               "batch volume < packed_min_rows/optimizer); measuring f32 "
               "tables")
        if explicit_table_dtype:
            ap.error(msg)
        print(f"# WARNING: {msg}", file=sys.stderr)
        effective_table_dtype = "float32"

    # Pre-stage device-resident batches (ZCM analog), stacked with a leading
    # round-robin axis so the whole timed run is ONE dispatch: per-call launch
    # latency through the runtime must not pollute device throughput, so we
    # lax.scan the train step on device (standard TPU practice).
    import jax.numpy as jnp

    n_batches = 4
    feeds_np, labels_np = random_batches(
        cfg, args.batch_size * n_batches, seed=0, learnable=False,
        zipf=(
            args.zipf if args.zipf > 0
            else (1.05 if args.host_tail_threshold > 0 else 0.0)
        ),
    )

    if getattr(model, "_host_tail", None):
        # host-tail configs step per batch: the host serves/updates tail
        # rows between device steps, so the measured path INCLUDES the host
        # work and the per-step dispatch (no single-dispatch scan possible)
        assert args.mode == "train", "host-tail bench measures training"
        batches = [
            ({k: v[args.batch_size * j: args.batch_size * (j + 1)]
              for k, v in feeds_np.items()},
             labels_np[args.batch_size * j: args.batch_size * (j + 1)])
            for j in range(n_batches)
        ]
        for i in range(max(args.warmup, 1)):  # >=1: compile outside timing
            loss = model.train_batch(*batches[i % n_batches])
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            loss = model.train_batch(*batches[i % n_batches])
        loss_val = float(loss)
        dt = time.perf_counter() - t0
        examples_per_sec = args.steps * args.batch_size / dt
        touched = sum(
            e[0].touched_rows for e in model._host_tail.entries.values()
        )
        print(
            f"# config={args.config} bs={args.batch_size} steps={args.steps} "
            f"dt={dt:.3f}s host-tail tables={len(model._host_tail.entries)} "
            f"touched_rows={touched} "
            f"drop_frac={model.host_tail_drop_fraction():.5f} "
            f"table_dtype={effective_table_dtype} "
            f"packed={'yes' if packed_engaged else 'no'} "
            f"examples/s={examples_per_sec:,.0f} loss={loss_val:.4f}",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": f"dlrm_{args.config}_{args.mode}_examples_per_sec",
            "value": round(examples_per_sec, 1),
            "unit": "examples/s",
            "vs_baseline": round(
                examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 4),
            "host_tail_tables": len(model._host_tail.entries),
            "host_tail_touched_rows": int(touched),
            "host_tail_drop_fraction": round(
                model.host_tail_drop_fraction(), 6),
            "devices": n_dev if args.mesh else 1,
            "table_dtype": effective_table_dtype,
            "packed_engaged": packed_engaged,
            "loss": round(loss_val, 5),
        }))
        return
    stacked_feeds = {
        k: v.reshape((n_batches, args.batch_size) + v.shape[1:])
        for k, v in feeds_np.items()
    }
    if args.host_routing and getattr(model, "_route_ops", None):
        route_stacks = {}
        for j in range(n_batches):
            batch = {k: v[j] for k, v in stacked_feeds.items()}
            for key, arr in model.compute_routes(batch).items():
                route_stacks.setdefault(key, []).append(arr)
        stacked_feeds.update(
            {k: np.stack(v) for k, v in route_stacks.items()}
        )
    stacked_labels = labels_np.reshape(n_batches, args.batch_size, -1)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def stage(v):
            spec = P(None, plan.batch_axis, *([None] * (v.ndim - 2)))
            return jax.device_put(v, NamedSharding(mesh, spec))
    else:
        stage = jax.device_put
    stacked_feeds = {k: stage(v) for k, v in stacked_feeds.items()}
    stacked_labels = stage(stacked_labels)

    if args.table_dtype != "float32" and args.mode == "infer":
        n_cast = model.quantize_embeddings(args.table_dtype)
        print(f"# quantized {n_cast} embedding arrays to {args.table_dtype}",
              file=sys.stderr)

    rng0 = jax.random.PRNGKey(0)
    params, opt_state, totals = model._params, model._opt_state, model._metrics_total
    step_fn = model._train_step_raw  # unjitted; we scan it ourselves

    if args.mode == "infer":
        fwd = model._forward_fn

        def multi_step(n, params, opt_state, totals):
            def body(carry, i):
                j = jax.lax.rem(i, n_batches)
                f = {k: v[j] for k, v in stacked_feeds.items()}
                out = fwd(params, f, False, rng0)
                return carry + jnp.sum(out).astype(jnp.float32), 0.0
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
            return params, opt_state, totals, acc

        run = jax.jit(multi_step, static_argnums=0)
    else:
        def multi_step(n, params, opt_state, totals):
            def body(carry, i):
                params, opt_state, totals = carry
                j = jax.lax.rem(i, n_batches)
                f = {k: v[j] for k, v in stacked_feeds.items()}
                l = stacked_labels[j]
                params, opt_state, totals, loss = step_fn(
                    params, opt_state, totals, f, l, jax.random.fold_in(rng0, i)
                )
                return (params, opt_state, totals), loss
            (params, opt_state, totals), losses = jax.lax.scan(
                body, (params, opt_state, totals), jnp.arange(n)
            )
            return params, opt_state, totals, losses[-1]

        run = jax.jit(multi_step, static_argnums=0, donate_argnums=(1, 2, 3))
    # warmup with the SAME static step count so the timed call reuses the
    # compiled executable (scan length is static)
    params, opt_state, totals, loss = run(args.steps, params, opt_state, totals)
    _ = float(loss)  # force completion (readback, not just block_until_ready)

    t0 = time.perf_counter()
    params, opt_state, totals, loss = run(args.steps, params, opt_state, totals)
    loss_val = float(loss)
    dt = time.perf_counter() - t0

    examples_per_sec = args.steps * args.batch_size / dt
    loss = loss_val if args.mode == "train" else 0.0  # infer: no loss
    per_chip = examples_per_sec / max(n_dev if args.mesh else 1, 1)
    # all-to-all GB/s for the pooled-embedding exchange (BASELINE.md metric):
    # 2 exchanges per fwd (index + pooled) + 1 in bwd (pooled grads), bytes
    # from the sharded layout (parallel/embedding_collection.py).
    a2a_gbps = 0.0
    layout = getattr(model, "_embedding_layout", None)
    if mesh is not None and layout is not None:
        dtype_bytes = 2 if args.compute_dtype in ("bfloat16", "float16") else 4
        step_bytes = layout.step_exchange_bytes(
            args.batch_size, dtype_bytes=dtype_bytes
        )
        a2a_gbps = step_bytes * args.steps / dt / 1e9
    print(
        f"# config={args.config} bs={args.batch_size} steps={args.steps} "
        f"dt={dt:.3f}s devices={n_dev} mesh={'yes' if mesh else 'no'} "
        f"table_dtype={effective_table_dtype} "
        f"packed={'yes' if packed_engaged else 'no'} "
        f"examples/s={examples_per_sec:,.0f} per-chip={per_chip:,.0f} "
        f"all-to-all={a2a_gbps:.4g}GB/s loss={float(loss):.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"dlrm_{args.config}_{args.mode}_examples_per_sec",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s",
                "vs_baseline": round(
                    examples_per_sec
                    / (BASELINE_EXAMPLES_PER_SEC if args.mode == "train"
                       else INFER_BASELINE_EXAMPLES_PER_SEC), 4),
                "examples_per_sec_per_chip": round(per_chip, 1),
                "devices": n_dev if args.mesh else 1,
                "all_to_all_gbps": round(a2a_gbps, 6),
                "table_dtype": effective_table_dtype,
                "packed_engaged": packed_engaged,
                "loss": round(loss, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
