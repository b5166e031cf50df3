"""Scaling projection: cost-model examples/s at 1..N chips (ffsim v2).

The BASELINE.md north star asks for >= 85% examples/s scaling efficiency
from 1 host to a v5e-64 slice; only one physical chip is reachable here, so
this harness (a) anchors the native ffsim cost model against the MEASURED
1-chip throughput, then (b) projects the table-parallel plan across slice
sizes with the JOINT (owner, split, mode) annealer, printing per-chip
examples/s and scaling efficiency. Same protocol as the reference's
simulated-makespan reporting (src/runtime/model.cc:1953-1955), anchored in
real measurement like its profile-then-simulate design.

v2 model notes (this round):
- a v5e-64 is ONE ICI slice (8x8 2D torus): the exchange rides per-axis
  bisection; there is NO DCN inside the slice (round 1 wrongly modeled
  host-to-host DCN and ring ICI -> 72.7%)
- the packed-update kernel replaces the scatter (update cost = table pass
  + ~2 ns/row instead of 75 ns/row), so far smaller split degrees hold the
  per-chip update at its floor
- the step is scored by the event-driven DAG schedule: the pooled exchange
  overlaps the bottom MLP, the dense-grad allreduce overlaps the embedding
  update

Run: python scripts/scaling_projection.py [--config kaggle|summit]
     [--per-chip-batch 8192] [--measured-exps 2959898 --measured-batch 65536]
"""
import argparse
import sys

sys.path.insert(0, ".")

from dlrm_flexflow_tpu import FFConfig
from dlrm_flexflow_tpu.autotune.machine import preset
from dlrm_flexflow_tpu.autotune.search import autotune_plan_joint
from dlrm_flexflow_tpu.models.dlrm import kaggle_config, make_dlrm_model, summit_config


def build(config_name: str, batch: int):
    cfg = {"kaggle": kaggle_config, "summit": summit_config}[config_name](
        batch_size=batch
    )
    return make_dlrm_model(cfg, FFConfig(batch_size=batch, compute_dtype="bfloat16"))


def machine_for(chips: int):
    return preset("tpu_v5e", num_chips=chips).torus_for(chips)


def _eff_under(config_name, per_chip_batch, budget, perturb=None):
    """1-host(8) -> 64-chip projected efficiency with an optional machine
    perturbation dict {field: factor}. Used by --sensitivity to bound the
    headline claim against the UNMEASURED multi-chip constants (only one
    chip is reachable; VERDICT r2 weakness #2/#4)."""
    import dataclasses

    per = {}
    for chips in (8, 64):
        gb = per_chip_batch * chips
        model = build(config_name, gb)
        spec = machine_for(chips)
        if perturb:
            spec = dataclasses.replace(
                spec,
                **{k: getattr(spec, k) * f for k, f in perturb.items()},
            )
        owner, best_us, report = autotune_plan_joint(
            model.graph, spec, gb, budget=budget, allow_splits=True,
            min_vocab=8192, exchange_dtype_bytes=2.0, table_dtype_bytes=2.0,
        )
        per[chips] = gb / (best_us / 1e6) / chips
    return per[64] / per[8]


def sensitivity(args):
    """Efficiency bound table: host->64 projected efficiency when each comm
    constant is off by +/-35% (the measured 1-chip raw model error)."""
    fields = [
        "ici_gbps", "dcn_gbps", "ici_latency_us", "routing_ns_per_entry",
        "update_pass_gbps", "gather_gbps",
    ]
    base = _eff_under(args.config, args.per_chip_batch, args.budget)
    print(f"# sensitivity of 1-host(8)->64 efficiency (base {base:.1%}), "
          f"each comm constant perturbed alone:")
    worst = base
    for f in fields:
        for fac in (0.65, 1.35):
            e = _eff_under(args.config, args.per_chip_batch, args.budget,
                           {f: fac})
            worst = min(worst, e)
            print(f"  {f:22s} x{fac:<5} -> {e:6.1%}")
    print(f"# worst-case single-constant efficiency: {worst:.1%} "
          f"(target >= 85%)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle", choices=["kaggle", "summit"])
    ap.add_argument("--per-chip-batch", type=int, default=8192)
    ap.add_argument("--measured-exps", type=float, default=2_959_898.0,
                    help="measured 1-chip examples/s for anchoring (0=off)")
    ap.add_argument("--measured-batch", type=int, default=65536)
    ap.add_argument("--budget", type=int, default=12000)
    ap.add_argument("--sensitivity", action="store_true",
                    help="print the comm-constant sensitivity bound table")
    args = ap.parse_args()
    if args.sensitivity:
        sensitivity(args)
        return

    anchor_ratio = 1.0
    if args.measured_exps > 0 and args.measured_batch > 0:
        model = build(args.config, args.measured_batch)
        _, pred_us, _ = autotune_plan_joint(
            model.graph, machine_for(1), args.measured_batch, budget=1,
            min_vocab=8192, exchange_dtype_bytes=2.0,
            table_dtype_bytes=2.0,
        )
        pred_exps = args.measured_batch / (pred_us / 1e6)
        anchor_ratio = args.measured_exps / pred_exps
        print(f"# anchor: measured {args.measured_exps:,.0f} ex/s, "
              f"model predicts {pred_exps:,.0f} -> ratio {anchor_ratio:.3f}")

    rows = []
    base_per_chip = None
    for chips in (1, 4, 8, 16, 32, 64):
        gb = args.per_chip_batch * chips  # weak scaling
        model = build(args.config, gb)
        owner, best_us, report = autotune_plan_joint(
            model.graph, machine_for(chips), gb,
            budget=args.budget if chips > 1 else 1,
            allow_splits=chips > 1,
            min_vocab=8192,  # seed mode matches the runtime one-hot default
            exchange_dtype_bytes=2.0,  # bench runs bf16 compute
            table_dtype_bytes=2.0,  # bf16 table storage is the shipped default
        )
        exps = gb / (best_us / 1e6) * anchor_ratio
        per_chip = exps / chips
        if base_per_chip is None:
            base_per_chip = per_chip
        eff = per_chip / base_per_chip
        rows.append((chips, exps, per_chip, eff))
        bd = report.get("breakdown", {}) if report else {}
        bd_s = " ".join(f"{k}={v:.0f}us" for k, v in sorted(bd.items()) if v > 0)
        sp = report.get("table_split", []) if report else []
        n_split = sum(1 for x in sp if x > 1)
        print(f"chips={chips:3d} global_bs={gb:7d} projected={exps:12,.0f} ex/s "
              f"per-chip={per_chip:10,.0f} scaling-eff={eff:6.1%} "
              f"split_tables={n_split}(max {max(sp) if sp else 1})  [{bd_s}]")
    per = {c: pc for c, _, pc, _ in rows}
    if 8 in per and 64 in per:
        host_eff = per[64] / per[8]
        print(f"# 1-host(8) -> 64-chip scaling efficiency: {host_eff:.1%} "
              f"(target >= 85%)")


if __name__ == "__main__":
    main()
