"""TPU machine models for the autotuner.

Analog of the reference's MachineModel v0/v1 (reference:
include/simulator.h:99-236, src/runtime/machine_model.cc, config format
machine_config_example:1-50): v0-style built-in presets for TPU
generations + a config-file override path, plus a measured-calibration
hook (the reference's profile-then-simulate philosophy,
Op::inner_measure_operator_cost, src/runtime/model.cu:20-64).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

from .bindings import FFSimMachine


@dataclasses.dataclass
class MachineSpec:
    name: str = "tpu_v5e"
    num_chips: int = 1
    chips_per_host: int = 4
    mxu_tflops: float = 197.0  # bf16 peak per chip
    hbm_gbps: float = 820.0
    hbm_capacity_gb: float = 14.0  # usable of 16
    ici_gbps: float = 45.0  # v5e per-link, one direction
    ici_latency_us: float = 1.0
    dcn_gbps: float = 25.0
    dcn_latency_us: float = 10.0
    # measured on v5e (PERF.md): gathers vectorize (~2 ns/row on 64 B rows),
    # scatter-add is issue-rate-bound (~75 ns/update)
    gather_gbps: float = 30.0  # effective random-row gather bw
    scatter_gbps: float = 1.1  # effective scatter-add bw (64 B rows)
    step_overhead_us: float = 30.0
    # reference: --simulator-segment-size / --simulator-max-num-segments
    segment_bytes: float = 16777216.0
    max_segments: float = 1.0
    # reference: --search-overlap-backward-update (0..1 overlap fraction)
    overlap_backward_update: float = 0.0
    # pooled exchange routing: 1 = hierarchical (ICI combine then per-
    # (host,table) rows over DCN, the runtime's chips_per_host path);
    # 0 = flat all-to-all (every slot's dense partial crosses DCN)
    hierarchical_a2a: float = 1.0
    # ---- v2: topology-aware model (reference: EnhancedMachineModel,
    # include/simulator.h:153-236) ----
    # ICI torus of one slice (0 => 1D ring over the domain). A v5e-64 is a
    # single 8x8 slice: ALL chips ICI-connected; DCN only across slices.
    ici_axis_x: int = 0
    ici_axis_y: int = 0
    # chips per ICI domain (slice); 0 => num_chips (single slice)
    ici_domain: int = 0
    # packed-update kernel model (ops/pallas/packed_update.py): sequential
    # table-pass bandwidth + per-lookup overhead. Calibrated from the
    # measured 10-table batched update (2.86 ms for 655k rows incl. 1.3 GB
    # of table passes). 0 => legacy scatter model.
    update_pass_gbps: float = 900.0
    update_ns_per_row: float = 2.0
    # score with the event-driven DAG schedule (a2a overlaps bottom MLP,
    # allreduce overlaps the embedding update)
    use_dag: int = 1
    # routed (capacity-bucketed) exchange model: wire independent of the
    # split degree + per-entry routing cost (parallel/routed_exchange.py)
    routed_exchange: int = 0
    routed_cap: float = 2.0
    routing_ns_per_entry: float = 3.0
    # model-axis size available for dense TP (mesh data x model); 1 = none
    model_axis: int = 1

    def torus_for(self, n: int) -> "MachineSpec":
        """Fill in the slice torus axes for an n-chip v5e-style slice
        (near-square 2D torus: 8->2x4, 16->4x4, 64->8x8)."""
        import math

        x = 1
        for cand in range(int(math.isqrt(n)), 0, -1):
            if n % cand == 0:
                x = cand
                break
        return dataclasses.replace(
            self, num_chips=n, ici_axis_x=x, ici_axis_y=n // x, ici_domain=n
        )

    def to_native(self) -> FFSimMachine:
        m = FFSimMachine()
        for f in FFSimMachine._fields_:
            setattr(m, f[0], getattr(self, f[0]))
        return m

    @staticmethod
    def from_file(path: str) -> "MachineSpec":
        """v1-style config file (JSON; ≅ --machine-model-file)."""
        with open(path) as f:
            doc = json.load(f)
        return MachineSpec(**doc)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


def preset(name: str, num_chips: int = 1, chips_per_host: Optional[int] = None) -> MachineSpec:
    """Built-in machine models (≅ SimpleMachineModel defaults)."""
    presets = {
        "tpu_v5e": MachineSpec(),
        "tpu_v5p": MachineSpec(
            name="tpu_v5p", mxu_tflops=459.0, hbm_gbps=2765.0,
            hbm_capacity_gb=90.0, ici_gbps=100.0, chips_per_host=4,
        ),
        "tpu_v4": MachineSpec(
            name="tpu_v4", mxu_tflops=275.0, hbm_gbps=1200.0,
            hbm_capacity_gb=30.0, ici_gbps=50.0, chips_per_host=4,
        ),
        "cpu_sim": MachineSpec(
            name="cpu_sim", mxu_tflops=0.2, hbm_gbps=20.0, hbm_capacity_gb=4.0,
            ici_gbps=2.0, chips_per_host=8, gather_gbps=1.0, scatter_gbps=1.0,
        ),
    }
    spec = dataclasses.replace(presets[name], num_chips=num_chips)
    if chips_per_host is not None:
        spec.chips_per_host = chips_per_host
    return spec


def calibrate(spec: MachineSpec, dim: int = 16, vocab: int = 1_000_000,
              batch: int = 8192, repeats: int = 20) -> MachineSpec:
    """Measure effective gather/scatter bandwidth on the real device and
    fold it into the spec (reference analog: measure_operator_cost running
    real kernels 5 warmup + 10 timed, model.cu:20-64).

    The repeat loop runs INSIDE one jitted lax.scan: per-dispatch latency
    through remote-tunnel backends is multiple ms and would otherwise
    dominate the measurement (same rationale as bench.py)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    table = jnp.zeros((vocab, dim), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, vocab, size=(batch,)), jnp.int32
    )
    g = jnp.ones((batch, dim), jnp.float32)

    @jax.jit
    def gather_n(t, i):
        def body(c, k):
            # vary the indices per step so the loop isn't hoisted
            return c + jnp.take(t, (i + k) % vocab, axis=0).sum(), 0.0
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
        return c

    @jax.jit
    def scatter_n(t, i, g):
        def body(t, k):
            return t.at[(i + k) % vocab].add(g), 0.0
        t, _ = jax.lax.scan(body, t, jnp.arange(repeats))
        return t

    _ = float(gather_n(table, idx))
    t0 = time.perf_counter()
    _ = float(gather_n(table, idx))
    g_time = (time.perf_counter() - t0) / repeats

    t2 = scatter_n(table, idx, g)
    _ = float(t2[0, 0])
    t0 = time.perf_counter()
    t2 = scatter_n(table, idx, g)
    _ = float(t2[0, 0])
    s_time = (time.perf_counter() - t0) / repeats

    bytes_moved = batch * dim * 4
    return dataclasses.replace(
        spec,
        gather_gbps=max(bytes_moved / g_time / 1e9, 0.1),
        scatter_gbps=max(bytes_moved / s_time / 1e9, 0.1),
    )
