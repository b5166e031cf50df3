"""Round-5 on-chip measurement runbook (run each part on the real TPU;
one TPU process at a time — the tunnel serves a single client).

Parts (VERDICT r4 items in parens):

  calib     — fresh full calibration -> .ffsim_machine.json (item 5):
              packed constants, per-dim gather/stream winners, then the
              MEASURED dense costs for the kaggle/summit/mlperf-lite MLP
              shapes and generic op costs (nmt LSTM, transformer
              attention/bmm) so the committed artifact reproduces the
              claimed model accuracy.
  residual  — whole-step residual anchored on kaggle AT THE SHIPPED
              DEFAULTS (bf16 tables, selective dispatch) + raw/calibrated
              transfer error on summit and mlperf-lite (item 5's PERF
              table).
  selective — decomp pass lanes: selective on/off x uniform/Zipf(1.05)
              (item 1's 'pass time ∝ touched chunks' evidence), then the
              full decomposition table (item 2).
  bench     — headline A/Bs (items 1, 8): uniform vs --zipf 1.05,
              selective on vs off, SGD vs --optimizer adam, serving bf16
              vs int8.
  crossover — packed auto-gate re-measurement at bs in {4k, 8k, 16k, 32k}
              packed on vs off (item 1: expect crossover well below 16384
              with selective dispatch).
  mlperf    — mlperf-full (unclipped 227M/293M vocabs, host-tail, Zipf)
              (item 3).
  quality   — 3-epoch learnable-synthetic smoke at shipped defaults with
              drop counters (item 9).

Timing protocol (PERF.md): one jitted lax.scan over pre-staged device
data; host readback (float()) ends every timed region.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _run(cmd, label):
    print(f"== {label}: {' '.join(cmd[1:])}", flush=True)
    subprocess.run(cmd, check=False)


def part_calib(args):
    from dlrm_flexflow_tpu.autotune.machine import (
        calibrate_dense, calibrate_graph_ops, calibrate_modes_for_dims,
        calibrate_or_cached, graph_dense_shapes, preset,
    )

    cache = ".ffsim_machine.json"
    if os.path.exists(cache) and not args.keep_cache:
        os.remove(cache)  # force fresh measurement
    spec = calibrate_or_cached(preset("tpu_v5e"), cache)
    spec = calibrate_modes_for_dims(spec, [16, 64, 128], verbose=True)
    spec.save(cache)

    # measured dense costs for every bench config's MLP shapes (the
    # reference times every op's real kernels per (op, config) and caches
    # them, src/runtime/model.cu:20-64)
    from dlrm_flexflow_tpu import FFConfig
    from dlrm_flexflow_tpu.models.dlrm import (
        kaggle_config, make_dlrm_model, mlperf_lite_config, summit_config,
    )

    shapes = []
    for fn, bs in ((kaggle_config, 65536), (summit_config, 32768),
                   (mlperf_lite_config, 16384)):
        cfg = fn(batch_size=bs)
        model = make_dlrm_model(cfg, FFConfig(batch_size=bs))
        shapes.extend(graph_dense_shapes(model.graph))
    shapes = sorted(set(shapes))
    print(f"dense shapes to measure: {shapes}", flush=True)
    spec = calibrate_dense(spec, shapes, batch=16384, repeats=args.repeats)
    spec.save(cache)
    print(f"dense_costs: {json.dumps(spec.dense_costs, indent=1)}",
          flush=True)

    # generic measured op costs at real zoo shapes (LSTM, attention, bmm)
    from dlrm_flexflow_tpu.models import zoo

    for name, build in (("nmt", lambda: zoo.nmt(batch_size=32)),
                        ("transformer", lambda: zoo.transformer(batch_size=8))):
        try:
            m = build()
            spec = calibrate_graph_ops(spec, m.graph, repeats=args.repeats)
        except Exception as e:  # pragma: no cover - measurement guard
            print(f"graph-op calib[{name}] skipped: {e}", flush=True)
    spec.save(cache)
    print(f"op_costs keys: {list(spec.op_costs)}", flush=True)
    print(f"saved -> {cache}; commit it", flush=True)


def part_residual(args):
    """Residual at the SHIPPED defaults (bf16 tables, selective on)."""
    import numpy as np

    from dlrm_flexflow_tpu import FFConfig, LossType, SGDOptimizer
    from dlrm_flexflow_tpu.autotune.machine import MachineSpec, preset
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import (
        kaggle_config, make_dlrm_model, mlperf_lite_config, summit_config,
    )

    cache = ".ffsim_machine.json"
    configs = [
        ("kaggle", kaggle_config, 65536),
        ("summit", summit_config, 32768),
        ("mlperf-lite", mlperf_lite_config, 16384),
    ]
    residual = None
    for name, fn, bs in configs:
        cfg = fn(batch_size=bs)
        ffc = FFConfig(batch_size=bs, compute_dtype="bfloat16")
        ffc.table_dtype = "bfloat16"  # the shipped bench default
        model = make_dlrm_model(cfg, ffc)
        model.compile(
            SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY, []
        )
        feeds, labels = random_batches(cfg, bs, seed=0)
        if name == "kaggle":
            residual, measured, pred = model.calibrate_step_residual(
                feeds, labels, steps=args.repeats, cache_path=cache
            )
            print(f"[{name}] measured {measured:.0f}us raw-pred {pred:.0f}us"
                  f" -> residual {residual:.3f}"
                  f" (raw error {100 * (pred / measured - 1):+.1f}%)",
                  flush=True)
        else:
            machine = (MachineSpec.from_file(cache) if os.path.exists(cache)
                       else preset("tpu_v5e")).torus_for(1)
            _, measured, pred = model.calibrate_step_residual(
                feeds, labels, steps=args.repeats, machine=machine
            )
            cal = pred * (residual if residual else 1.0)
            print(f"[{name}] measured {measured:.0f}us raw-pred {pred:.0f}us"
                  f" (raw error {100 * (pred / measured - 1):+.1f}%), "
                  f"kaggle-residual-calibrated {cal:.0f}us "
                  f"({100 * (cal / measured - 1):+.1f}%)", flush=True)


def part_selective(args):
    base = [sys.executable, "scripts/decomp_phase.py",
            "--batch", str(args.batch), "--repeats", str(args.repeats)]
    _run(base + ["--phases", "selective"], "selective pass lanes")
    _run(base + ["--phases", "gathers,pass,update,prep,mlp,onehot"],
         "full decomposition (uniform)")
    _run(base + ["--phases", "update,prep", "--zipf", "1.05"],
         "update+prep (zipf)")


def part_bench(args):
    base = [sys.executable, "bench.py", "--batch-size", str(args.batch),
            "--steps", "30", "--warmup", "5"]
    runs = [
        ("train uniform (selective on)", base),
        ("train uniform (selective OFF)", base + ["--packed-selective", "off"]),
        ("train zipf1.05 (selective on)", base + ["--zipf", "1.05"]),
        ("train zipf1.05 (selective OFF)",
         base + ["--zipf", "1.05", "--packed-selective", "off"]),
        ("train adam", base + ["--optimizer", "adam"]),
        ("train adam zipf", base + ["--optimizer", "adam", "--zipf", "1.05"]),
        ("infer bf16", base + ["--mode", "infer", "--table-dtype",
                               "bfloat16"]),
        ("infer int8", base + ["--mode", "infer", "--table-dtype", "int8"]),
        # mid-band one-hot sweep: kaggle has 4 tables in (8192, 262144]
        # (12.5k/15k/93k/142.5k rows) that currently ride the packed
        # gather+stream path; the packed one-hot matmul (dense grads, no
        # gather/stream) may beat it for them
        ("train midband-150k", base + ["--onehot-packed-threshold",
                                       "150000"]),
        ("train midband-150k zipf", base + ["--onehot-packed-threshold",
                                            "150000", "--zipf", "1.05"]),
    ]
    for label, cmd in runs:
        _run(cmd, label)


def part_crossover(args):
    for bs in (4096, 8192, 16384, 32768):
        base = [sys.executable, "bench.py", "--batch-size", str(bs),
                "--steps", "30", "--warmup", "5", "--zipf", "1.05"]
        _run(base + ["--packed-tables", "on"], f"bs={bs} packed")
        _run(base + ["--packed-tables", "off"], f"bs={bs} scatter")


def part_mlperf(args):
    _run([sys.executable, "bench.py", "--config", "mlperf-full",
          "--batch-size", str(args.batch), "--steps", "20", "--warmup", "3"],
         "mlperf-full host-tail")


def part_quality(args):
    """3-epoch learnable-synthetic smoke at the shipped defaults."""
    from dlrm_flexflow_tpu import (
        FFConfig, LossType, MetricsType, SGDOptimizer,
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import kaggle_config, make_dlrm_model

    bs = 8192
    cfg = kaggle_config(batch_size=bs)
    ffc = FFConfig(batch_size=bs, compute_dtype="bfloat16")
    ffc.table_dtype = "bfloat16"
    ffc.packed_tables = "on"  # shipped default engages at bench batch; the
    # smoke's smaller batch must still exercise the packed+bf16 path
    model = make_dlrm_model(cfg, ffc)
    model.compile(
        SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY, MetricsType.METRICS_AUC_ROC],
    )
    feeds, labels = random_batches(cfg, bs * 24, seed=3, learnable=True)
    for ep in range(3):
        model.fit(feeds, labels, epochs=1, verbose=False)
        m = model.get_metrics()
        print(f"epoch {ep}: acc={m.get('accuracy', 0):.4f} "
              f"auc={m.get('auc', 0):.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("part", choices=["calib", "residual", "selective",
                                     "bench", "crossover", "mlperf",
                                     "quality"])
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--keep-cache", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if not args.allow_cpu:
        assert jax.devices()[0].platform == "tpu", (
            "refusing to run measurement parts off-TPU"
        )
    {"calib": part_calib, "residual": part_residual,
     "selective": part_selective, "bench": part_bench,
     "crossover": part_crossover, "mlperf": part_mlperf,
     "quality": part_quality}[args.part](args)


if __name__ == "__main__":
    main()
