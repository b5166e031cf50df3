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
  decomp  — step decomposition at kaggle bs=65536: full train step,
            forward-only, and no-update ablations.

Timing protocol (PERF.md): one jitted lax.scan over pre-staged device
data; host readback (float()) ends every timed region; same static args
for warmup and timed calls.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, repeats: int) -> float:
    """us per repeat of a jitted scan-of-repeats callable."""
    out = float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = float(fn(*args))
    del out
    return (time.perf_counter() - t0) / repeats * 1e6


def part_gather(args):
    from dlrm_flexflow_tpu.ops.pallas.packed_update import (
        pack_table, packed_gather, packed_gather_subpack,
    )

    for name, dim, vocab in (("kaggle", 16, 1_000_000),
                             ("summit", 64, 1_000_000)):
        streams, batch = 10, args.batch
        packs = [
            pack_table(jnp.zeros((vocab, dim), jnp.float32))
            for _ in range(streams)
        ]
        idx = jax.random.randint(
            jax.random.PRNGKey(2), (args.repeats, streams, batch),
            0, vocab, jnp.int32,
        )

        def make(gather_fn):
            @jax.jit
            def loop(packs, idx):
                def body(c, i):
                    acc = jnp.zeros(())
                    for s, p in enumerate(packs):
                        acc = acc + jnp.sum(gather_fn(p, i[s], dim))
                    return c + acc, 0.0
                c, _ = jax.lax.scan(body, jnp.zeros(()), idx)
                return c
            return loop

        for label, fn in (("pack", packed_gather),
                          ("subpack", packed_gather_subpack)):
            us = _timed(make(fn), packs, idx, repeats=args.repeats)
            ns_row = us * 1e3 / (streams * batch)
            print(f"gather {name:7s} {label:8s} {us:9.1f} us/step "
                  f"({ns_row:6.2f} ns/row, {streams}x{batch} D={dim})")


def part_stream(args):
    from dlrm_flexflow_tpu.ops.pallas.packed_update import (
        pack_table, packed_row_update_batched, set_stream_mode,
    )

    dim, vocab, tables, k = 16, 1_000_000, 10, args.batch
    g = jnp.ones((tables, k, dim), jnp.float32)
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (args.repeats, tables, k), 0, vocab, jnp.int32
    )

    def timed_mode(mode: str) -> float:
        set_stream_mode(mode)
        packs = [
            pack_table(jnp.zeros((vocab, dim), jnp.float32))
            for _ in range(tables)
        ]

        @jax.jit
        def loop(packs, idx):
            def body(c, i):
                newc = packed_row_update_batched(
                    list(c), [i[t] for t in range(tables)],
                    [g[t] for t in range(tables)], [vocab] * tables, dim,
                )
                return tuple(newc), 0.0
            c, _ = jax.lax.scan(body, tuple(packs), idx)
            return sum(cc[0, 0] for cc in c)

        return _timed(loop, packs, idx, repeats=args.repeats)

    for mode in ("expanded", "compact"):
        us = timed_mode(mode)
        print(f"stream {mode:9s} {us:9.1f} us/step "
              f"({tables}x{k} updates D={dim})")
    set_stream_mode("expanded")


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

    spec = calibrate_modes_for_dims(spec, [16, 64, 128])
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
        ("infer(best)", base + ["--mode", "infer"]),
    ]
    for label, cmd in runs:
        print(f"== {label}: {' '.join(cmd[1:])}", flush=True)
        subprocess.run(cmd, check=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("part", choices=["gather", "stream", "calib", "decomp"])
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--keep-cache", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices())
    {"gather": part_gather, "stream": part_stream,
     "calib": part_calib, "decomp": part_decomp}[args.part](args)


if __name__ == "__main__":
    main()
