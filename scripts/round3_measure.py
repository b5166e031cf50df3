"""Round-3 on-chip measurement runbook (run each part on the real TPU).

Parts (all independent; TPU runs must not overlap):
  gather  — packed_gather (whole-pack+mask) vs packed_gather_subpack
            (lane-sliced lax.gather) at kaggle (D=16) and summit (D=64)
            dims; the forward-gather lever (VERDICT r2 item 1).
  stream  — expanded vs compact update streams through
            packed_row_update_batched at kaggle dims (VERDICT r2 item 2).
  calib   — fresh full calibration (gather mode + stream mode + packed
            constants + narrow gather/scatter) -> .ffsim_machine.json;
            commit the file so bench/compile pick the measured winners.
  residual— whole-step residual anchored on kaggle (saved into the
            machine file) + raw/calibrated prediction error on summit and
            mlperf-lite (the VERDICT r2 item-5 transfer validation); run
            AFTER calib (a fresh machine file has step_residual 1.0).
  decomp  — step decomposition at kaggle bs=65536: full train step,
            forward-only, and no-update ablations.

Timing protocol (PERF.md): one jitted lax.scan over pre-staged device
data; host readback (float()) ends every timed region; same static args
for warmup and timed calls.
"""
from __future__ import annotations

import argparse
import os
import sys

# `python scripts/round3_measure.py` puts scripts/ (not the repo root) on
# sys.path; make the package importable regardless of invocation cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def part_gather(args):
    """A/B the two gather implementations via the SAME harness compile()
    runs (calibrate_packed_gather prints both timings under verbose); dims
    cover the kaggle/summit/mlperf configs."""
    from dlrm_flexflow_tpu.autotune.machine import (
        calibrate_packed_gather, preset,
    )

    spec = preset("tpu_v5e")
    for dim in (16, 64):
        spec = calibrate_packed_gather(
            spec, dim=dim, batch=args.batch, repeats=args.repeats,
            verbose=True,
        )
    print(f"winners: {spec.gather_mode_by_dim} "
          f"(D=16 gather_gbps={spec.gather_gbps:.2f})")


def part_stream(args):
    """A/B the two stream formats via the SAME harness compile() runs."""
    from dlrm_flexflow_tpu.autotune.machine import (
        calibrate_stream_mode, preset,
    )

    spec = preset("tpu_v5e")
    for dim in (16, 64):
        spec = calibrate_stream_mode(
            spec, dim=dim, k=args.batch, repeats=args.repeats, verbose=True,
        )
    print(f"winners: {spec.stream_mode_by_dim}")


def part_calib(args):
    import os

    from dlrm_flexflow_tpu.autotune.machine import calibrate_or_cached, preset

    cache = ".ffsim_machine.json"
    if os.path.exists(cache) and not args.keep_cache:
        os.remove(cache)  # force fresh measurement
    spec = calibrate_or_cached(preset("tpu_v5e"), cache)
    # per-dim winners for the bench configs' other row dims (summit D=64,
    # mlperf D=128); single-chip bench applies them from the machine file
    from dlrm_flexflow_tpu.autotune.machine import calibrate_modes_for_dims

    spec = calibrate_modes_for_dims(spec, [16, 64, 128], verbose=True)
    spec.save(cache)
    print(f"gather_gbps={spec.gather_gbps:.2f} gather_mode={spec.gather_mode}")
    print(f"stream_mode={spec.stream_mode}")
    print(f"gather_mode_by_dim={spec.gather_mode_by_dim}")
    print(f"stream_mode_by_dim={spec.stream_mode_by_dim}")
    print(f"update: pass={spec.update_pass_gbps:.0f}GB/s "
          f"{spec.update_ns_per_row:.1f}ns/row "
          f"{spec.update_us_per_table:.0f}us/table")
    print(f"scatter_gbps={spec.scatter_gbps:.2f}")
    print(f"saved -> {cache}; commit it so compile/bench apply the winners")


def part_residual(args):
    """Whole-step residual + per-config prediction accuracy (run AFTER
    calib: the fresh machine file's step_residual is 1.0 until this runs).
    kaggle anchors the residual and SAVES it into .ffsim_machine.json;
    summit / mlperf-lite then report raw and residual-calibrated
    prediction error — the VERDICT r2 item-5 'transfers within 15%'
    validation."""
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
        model = make_dlrm_model(
            cfg, FFConfig(batch_size=bs, compute_dtype="bfloat16")
        )
        model.compile(
            SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY, []
        )
        feeds, labels = random_batches(cfg, bs, seed=0)
        if name == "kaggle":
            # anchor: measure + store the residual in the machine file
            residual, measured, pred = model.calibrate_step_residual(
                feeds, labels, steps=args.repeats, cache_path=cache
            )
            print(f"[{name}] measured {measured:.0f}us raw-pred {pred:.0f}us"
                  f" -> residual {residual:.3f}"
                  f" (raw error {100 * (pred / measured - 1):+.1f}%)",
                  flush=True)
        else:
            # transfer check: do NOT overwrite the anchored residual
            import os

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


def part_decomp(args):
    """Step decomposition via bench-protocol ablations (run AFTER calib so
    auto modes pick the measured winners)."""
    import subprocess
    import sys

    base = [sys.executable, "bench.py", "--batch-size", str(args.batch),
            "--steps", "30", "--warmup", "5"]
    runs = [
        ("train(best)", base),
        ("train(pack)", base + ["--packed-gather-mode", "pack"]),
        ("train(subpack)", base + ["--packed-gather-mode", "subpack"]),
        ("train(expanded)", base + ["--packed-stream-mode", "expanded"]),
        ("train(compact)", base + ["--packed-stream-mode", "compact"]),
        ("train(all-packed)", base + ["--onehot-threshold", "0"]),
        ("infer(best)", base + ["--mode", "infer"]),
        ("infer(bf16-tables)", base + ["--mode", "infer",
                                       "--table-dtype", "bfloat16"]),
        ("infer(int8-tables)", base + ["--mode", "infer",
                                       "--table-dtype", "int8"]),
    ]
    for label, cmd in runs:
        print(f"== {label}: {' '.join(cmd[1:])}", flush=True)
        subprocess.run(cmd, check=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("part", choices=["gather", "stream", "calib",
                                     "residual", "decomp"])
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--keep-cache", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="plumbing smoke only: parts that SAVE "
                         ".ffsim_machine.json would pollute it with "
                         "CPU-measured garbage (step_residual ~1000x)")
    args = ap.parse_args()
    print("devices:", jax.devices())
    if not args.allow_cpu:
        assert jax.devices()[0].platform == "tpu", (
            "refusing to run measurement parts off-TPU (pass --allow-cpu "
            "for plumbing smokes, in a scratch cwd)"
        )
    {"gather": part_gather, "stream": part_stream, "calib": part_calib,
     "residual": part_residual, "decomp": part_decomp}[args.part](args)


if __name__ == "__main__":
    main()
