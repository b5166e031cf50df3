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
    # table-pass bandwidth + per-lookup overhead + per-table fixed cost
    # (kernel launch, chunk-starts prep). Calibrated on-device at compile.
    # 0 => legacy scatter model.
    update_pass_gbps: float = 900.0
    update_ns_per_row: float = 2.0
    update_us_per_table: float = 100.0
    # score with the event-driven DAG schedule (a2a overlaps bottom MLP,
    # allreduce overlaps the embedding update). For the graph-generic path:
    # 1 = per-chip timelines (each chip's own gather/dense/update chain —
    # the reference's per-device scheduling, simulator.cc:500-560);
    # 2 = representative-chip collapse (n x fewer tasks per eval; an upper
    # bound that charges one chip both phase maxes); 0 = closed-form sum
    use_dag: int = 1
    # routed (capacity-bucketed) exchange model: wire independent of the
    # split degree + per-entry routing cost (parallel/routed_exchange.py)
    routed_exchange: int = 0
    routed_cap: float = 2.0
    routing_ns_per_entry: float = 3.0
    # model-axis size available for dense TP (mesh data x model); 1 = none
    model_axis: int = 1
    # host-tail offload terms (parallel/host_tail.py; search mode 2): the
    # host<->device link carrying the compact (pos, val) tail exchange
    # (PCIe gen3 x16 class defaults; this env's tunnel is slower but the
    # design target is a local host) and the per-row host lookup/update cost
    pcie_gbps: float = 10.0
    pcie_latency_us: float = 20.0
    host_row_ns: float = 60.0
    # dense-parameter sync mode for the cost model: 0 = allreduce (what
    # the runtime implements — XLA psum over ICI), 1 = parameter-server
    # (reference simulator.cc:403-498 models both sync modes; the PS branch
    # is kept for comparison only — tests show allreduce winning on the
    # torus, which is why the runtime has no PS path)
    param_sync: int = 0
    ps_gbps: float = 0.0  # PS link + host update bandwidth; 0 => pcie_gbps
    # measured/predicted full-step ratio from FFModel.calibrate_step_residual
    # (the profile-then-simulate loop closed over the WHOLE step: per-kernel
    # constants above get the per-op costs right, the residual absorbs what
    # the analytic model cannot see — scheduler slack, fusion effects).
    # Not part of the native struct; applied to reported predictions.
    step_residual: float = 1.0
    # measured winner of the packed row-gather calibration ("pack" whole-
    # pack fetch+mask vs "subpack" (1, D) lane slices); applied by compile
    # when FFConfig.packed_gather_mode == "auto". Not a native-struct field.
    gather_mode: str = "pack"
    # measured winner of the update-stream calibration ("expanded" XLA
    # lane expansion vs "compact" in-kernel expansion); applied by compile
    # when FFConfig.packed_stream_mode == "auto". Not a native-struct field.
    stream_mode: str = "expanded"
    # per-row-dim measured winners (keys str(D), like dense_costs): the
    # flagship D=16 calibration sets the scalar defaults above; compile
    # measures any OTHER packed dim the model uses on first TPU compile
    # and caches the winner here (the reference's per-(op,config)
    # measurement philosophy, src/runtime/model.cu:20-64)
    gather_mode_by_dim: dict = dataclasses.field(default_factory=dict)
    stream_mode_by_dim: dict = dataclasses.field(default_factory=dict)
    # MEASURED dense-op costs: {"<in>x<out>": effective fwd us per example}
    # (timed fwd+bwd / 3, matching the model's bwd = 2x fwd convention) —
    # the reference times every op's real kernels per (op, config) and
    # caches them (src/runtime/model.cu:20-64, simulator.cc:299-319); this
    # is that table, persisted in the machine file. Lowering looks shapes
    # up and sets FFSimOp.fwd_us, replacing the analytic roofline.
    dense_costs: dict = dataclasses.field(default_factory=dict)
    # MEASURED generic op costs for the other MXU ops (conv / batch-matmul
    # / attention): {op_cost_sig: fwd us per example}, same convention —
    # together with dense_costs this is the full per-(op,config) measured
    # table of the reference's measure_operator_cost
    op_costs: dict = dataclasses.field(default_factory=dict)

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

    def predict_step_us(self, raw_model_us: float) -> float:
        """Calibrated absolute prediction (model output x step residual)."""
        return raw_model_us * (self.step_residual or 1.0)

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

    # measure STREAMS concurrent gathers/scatters: the model charges each
    # table's lookup at gather_gbps and a DLRM step runs its tables'
    # gathers concurrently, so the effective per-stream bandwidth is what
    # the cost model needs (a serial single-gather measurement would
    # overstate the cost ~4x — latency hiding across independent ops)
    streams = 8
    tables = [jnp.zeros((vocab, dim), jnp.float32) for _ in range(streams)]
    idx = jnp.asarray(
        np.random.default_rng(0).integers(
            0, vocab, size=(streams, batch)
        ), jnp.int32,
    )
    g = jnp.ones((batch, dim), jnp.float32)

    @jax.jit
    def gather_n(ts, i):
        def body(c, k):
            acc = jnp.zeros(())
            for s, t in enumerate(ts):
                # vary the indices per step so the loop isn't hoisted;
                # full reduce so XLA cannot strength-reduce the gather
                acc = acc + jnp.sum(t.at[(i[s] + k) % vocab].get(
                    mode="promise_in_bounds"
                ))
            return c + acc, 0.0
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
        return c

    @jax.jit
    def scatter_n(ts, i, g):
        def body(ts, k):
            return tuple(
                t.at[(i[s] + k) % vocab].add(g) for s, t in enumerate(ts)
            ), 0.0
        ts, _ = jax.lax.scan(body, tuple(ts), jnp.arange(repeats))
        # consume every chain (returning one table would let XLA dead-code
        # the other streams and inflate the measurement streams-fold)
        return sum(t[0, 0] for t in ts)

    _ = float(gather_n(tables, idx))
    t0 = time.perf_counter()
    _ = float(gather_n(tables, idx))
    g_time = (time.perf_counter() - t0) / repeats / streams

    _ = float(scatter_n(tables, idx, g))
    t0 = time.perf_counter()
    _ = float(scatter_n(tables, idx, g))
    s_time = (time.perf_counter() - t0) / repeats / streams

    bytes_moved = batch * dim * 4
    return dataclasses.replace(
        spec,
        gather_gbps=max(bytes_moved / g_time / 1e9, 0.1),
        scatter_gbps=max(bytes_moved / s_time / 1e9, 0.1),
    )


def solve_update_model4(m1: float, m2: float, m3: float, m4: float,
                        k1: int, k2: int, t1: int, t2: int,
                        tb_small: float, tb_big: float):
    """Fit t(K, T, V) = F + T*(2*tb/pass + per_table) + T*K*ns from FOUR
    packed-update measurements: (k1, t1, small), (k2, t1, small),
    (k2, t2, small), (k2, t1, big). A vocab-varied point isolates the
    bytes-proportional pass from the per-table fixed cost (kernel launch,
    chunk-starts prep) — conflating them overcharges multi-million-row
    tables; the per-step fixed term F keeps both honest. Returns
    (pass_gbps, ns, per_table_us, fixed_us)."""
    ns = (m2 - m1) / max(t1 * (k2 - k1), 1) * 1e9
    ns = max(0.1, min(ns, 1000.0))
    pass_per_byte = max((m4 - m2) / max(t1 * 2.0 * (tb_big - tb_small), 1.0),
                        1e-13)
    pass_gbps = max(10.0, min(1.0 / pass_per_byte / 1e9, 3000.0))
    per_table = max(
        (m3 - m2 - (t2 - t1) * k2 * ns * 1e-9) / max(t2 - t1, 1)
        - 2.0 * tb_small / (pass_gbps * 1e9),
        0.0,
    )
    fixed = (m1 - t1 * (2.0 * tb_small / (pass_gbps * 1e9) + per_table)
             - t1 * k1 * ns * 1e-9)
    return pass_gbps, ns, per_table * 1e6, max(0.0, fixed) * 1e6


def measure_dispatch_latency(repeats: int = 16) -> float:
    """Seconds per (dispatch + scalar readback) of a trivial jitted call —
    through a remote tunnel this is ~2.5-20 ms and would otherwise leak
    into every timed-loop measurement's fixed term (each timed region is
    ONE jitted call whose wall time includes exactly one dispatch+readback
    round trip)."""
    import time

    import jax
    import jax.numpy as jnp

    x = jnp.zeros(())

    @jax.jit
    def null(x):
        return x + 1.0

    _ = float(null(x))
    t0 = time.perf_counter()
    for _ in range(repeats):
        _ = float(null(x))
    return (time.perf_counter() - t0) / repeats


def calibrate_packed(spec: MachineSpec, dim: int = 16, vocab: int = 1_000_000,
                     repeats: int = 32) -> MachineSpec:
    """Measure the packed-update kernel's table-pass bandwidth, per-row
    cost, and per-step fixed overhead on the real device — the v2 analog
    of the reference's per-(op,config) kernel profiling
    (src/runtime/model.cu:20-64). Three (K, tables) points separate the
    three terms. Each timed region is one jitted call over `repeats` scan
    steps; the call's single dispatch+readback round trip (tunnel-sized,
    measured separately) is subtracted before the /repeats so it cannot
    masquerade as per-step on-chip overhead in the fitted fixed term."""
    import time

    import jax
    import jax.numpy as jnp

    from ..ops.pallas.packed_update import pack_table, packed_row_update_batched

    dispatch_s = measure_dispatch_latency()

    def timed_at(k: int, tables: int, v: int = 0) -> float:
        v = v or vocab
        packs = [
            pack_table(jnp.zeros((v, dim), jnp.float32))
            for _ in range(tables)
        ]
        idx = jax.random.randint(
            jax.random.PRNGKey(1), (repeats, tables, k), 0, v, jnp.int32
        )
        g = jnp.ones((tables, k, dim), jnp.float32)

        @jax.jit
        def loop(packs, idx):
            def body(c, i):
                newc = packed_row_update_batched(
                    list(c), [i[t] for t in range(tables)],
                    [g[t] for t in range(tables)], [v] * tables, dim,
                )
                return tuple(newc), 0.0
            c, _ = jax.lax.scan(body, tuple(packs), idx)
            return sum(cc[0, 0] for cc in c)

        out = loop(packs, idx)
        _ = float(out)
        t0 = time.perf_counter()
        out = loop(packs, idx)
        _ = float(out)
        return max(
            (time.perf_counter() - t0 - dispatch_s) / repeats, 1e-7
        )

    k1, k2, t1, t2 = 16384, 65536, 4, 8
    big_vocab = vocab * 4
    m1, m2, m3 = timed_at(k1, t1), timed_at(k2, t1), timed_at(k2, t2)
    m4 = timed_at(k2, t1, big_vocab)
    tb_small = float(
        pack_table(jnp.zeros((vocab, dim), jnp.float32)).size * 4
    )
    tb_big = float(
        pack_table(jnp.zeros((big_vocab, dim), jnp.float32)).size * 4
    )
    pass_gbps, ns, per_table_us, fixed_us = solve_update_model4(
        m1, m2, m3, m4, k1, k2, t1, t2, tb_small, tb_big
    )
    return dataclasses.replace(
        spec, update_pass_gbps=pass_gbps, update_ns_per_row=ns,
        update_us_per_table=per_table_us,
        step_overhead_us=spec.step_overhead_us + fixed_us,
    )


def calibrate_packed_gather(spec: MachineSpec, dim: int = 16,
                            vocab: int = 1_000_000, batch: int = 65536,
                            streams: int = 8, repeats: int = 8,
                            verbose: bool = False) -> MachineSpec:
    """Measure the PACKED forward gather (the runtime's actual lookup path,
    ops/pallas/packed_update.packed_gather) with concurrent streams at the
    bench batch regime; gather_gbps becomes the aggregate effective rate."""
    import time

    import jax
    import jax.numpy as jnp

    from ..ops.pallas.packed_update import (
        pack_table, packed_gather, packed_gather_subpack,
    )

    # cap per-table bytes at 64 MB so wide-D calibration fits comfortably
    vocab = min(vocab, max(65536, (1 << 26) // (dim * 4)))
    packs = [
        pack_table(jnp.zeros((vocab, dim), jnp.float32))
        for _ in range(streams)
    ]
    idx = jax.random.randint(
        jax.random.PRNGKey(2), (repeats, streams, batch), 0, vocab, jnp.int32
    )

    def timed(gather_fn) -> float:
        @jax.jit
        def loop(packs, idx):
            def body(c, i):
                acc = jnp.zeros(())
                for s, p in enumerate(packs):
                    # full reduce: consuming a single element would let
                    # XLA strength-reduce the gather to one row
                    acc = acc + jnp.sum(gather_fn(p, i[s], dim))
                return c + acc, 0.0
            c, _ = jax.lax.scan(body, jnp.zeros(()), idx)
            return c

        _ = float(loop(packs, idx))
        t0 = time.perf_counter()
        _ = float(loop(packs, idx))
        return (time.perf_counter() - t0) / repeats / streams

    # both implementations measured; the winner becomes the runtime's
    # gather (compile applies machine.gather_mode under mode "auto") and
    # its rate the cost model's gather_gbps
    t_pack = timed(packed_gather)
    t_sub = timed(packed_gather_subpack)
    mode = "subpack" if t_sub < t_pack else "pack"
    g_time = min(t_pack, t_sub)
    if verbose:
        ns = 1e9 / batch
        print(f"[calibrate] gather D={dim}: pack {t_pack * ns:.2f} ns/row, "
              f"subpack {t_sub * ns:.2f} ns/row -> {mode}")
    by_dim = dict(spec.gather_mode_by_dim)
    by_dim[str(dim)] = mode
    out = dataclasses.replace(spec, gather_mode_by_dim=by_dim)
    if dim == 16:
        # the flagship dim also sets the scalar default + the cost model's
        # effective gather rate
        out = dataclasses.replace(
            out,
            gather_gbps=max(batch * dim * 4 / g_time / 1e9, 0.1),
            gather_mode=mode,
        )
    return out


def calibrate_stream_mode(spec: MachineSpec, dim: int = 16,
                          vocab: int = 1_000_000, k: int = 65536,
                          tables: int = 4, repeats: int = 8,
                          verbose: bool = False) -> MachineSpec:
    """Measure the packed update end-to-end under both update-stream
    formats (expanded [K, 128] XLA lane expansion vs compact [K/rpp, 128]
    with in-kernel expansion) and record the winner; the module mode is
    left set to it so calibrate_packed's fitted constants match."""
    import time

    import jax
    import jax.numpy as jnp

    from ..ops.pallas.packed_update import (
        pack_table, packed_row_update_batched, rows_per_pack,
        set_stream_mode,
    )

    by_dim = dict(spec.stream_mode_by_dim)
    if rows_per_pack(dim) == 1:
        # a pack IS a row: the two formats are the same program
        by_dim[str(dim)] = "expanded"
        return dataclasses.replace(spec, stream_mode_by_dim=by_dim)
    # cap per-table bytes at 64 MB so wide-D calibration fits comfortably
    vocab = min(vocab, max(65536, (1 << 26) // (dim * 4)))
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (repeats, tables, k), 0, vocab, jnp.int32
    )
    g = jnp.ones((tables, k, dim), jnp.float32)

    interpret = jax.default_backend() != "tpu"  # CPU smoke path

    def timed() -> float:
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
                    interpret=interpret,
                )
                return tuple(newc), 0.0
            c, _ = jax.lax.scan(body, tuple(packs), idx)
            return sum(cc[0, 0] for cc in c)

        _ = float(loop(packs, idx))
        t0 = time.perf_counter()
        _ = float(loop(packs, idx))
        return (time.perf_counter() - t0) / repeats

    # the expanded baseline must work — a failure there is a real
    # environment error, not a reason to silently record a winner
    set_stream_mode("expanded", dim)
    t_exp = timed()
    try:
        set_stream_mode("compact", dim)
        t_cmp = timed()
    except Exception as e:
        # the compact kernel is newer Mosaic surface (rolls, in-kernel
        # expansion); if it fails to compile on this toolchain, fall back
        print(f"[calibrate] WARNING: compact stream kernel failed at D={dim} "
              f"({type(e).__name__}: {e}); recording expanded")
        set_stream_mode("expanded", dim)
        by_dim[str(dim)] = "expanded"
        out = dataclasses.replace(spec, stream_mode_by_dim=by_dim)
        if dim == 16:
            out = dataclasses.replace(out, stream_mode="expanded")
        return out
    if verbose:
        print(f"[calibrate] stream D={dim}: expanded {t_exp * 1e3:.2f} ms, "
              f"compact {t_cmp * 1e3:.2f} ms")
    # the module mode is intentionally left at the winner so the
    # subsequent calibrate_packed measures what the runtime will run
    mode = "compact" if t_cmp < t_exp else "expanded"
    set_stream_mode(mode, dim)
    by_dim[str(dim)] = mode
    out = dataclasses.replace(spec, stream_mode_by_dim=by_dim)
    if dim == 16:
        out = dataclasses.replace(out, stream_mode=mode)
    return out


def calibrate_modes_for_dims(spec: MachineSpec, dims,
                             verbose: bool = False) -> MachineSpec:
    """Measure the gather + stream winners for every PACKED row dim the
    model actually uses that isn't already in the machine file's per-dim
    maps (the reference's per-(op,config) measurement, cached cumulatively
    like dense_costs). Returns the updated spec; the caller saves it."""
    from ..ops.pallas.packed_update import rows_per_pack

    for d in sorted({int(d) for d in dims}):
        if str(d) not in spec.gather_mode_by_dim:
            if rows_per_pack(d) == 1:
                # pack == row: the two gathers are the same program
                by = dict(spec.gather_mode_by_dim)
                by[str(d)] = "pack"
                spec = dataclasses.replace(spec, gather_mode_by_dim=by)
            else:
                spec = calibrate_packed_gather(spec, dim=d, verbose=verbose)
        if str(d) not in spec.stream_mode_by_dim:
            spec = calibrate_stream_mode(spec, dim=d, verbose=verbose)
    return spec


def calibrate_dense(spec: MachineSpec, shapes, batch: int = 16384,
                    repeats: int = 20) -> MachineSpec:
    """Measure fwd+bwd of the model's ACTUAL dense shapes on the device and
    cache effective per-example costs (reference: every op's real kernels
    timed per (op, config) and cached, src/runtime/model.cu:20-64,
    simulator.cc:299-319 — this replaces the MLP rooflines that carried
    the +35%% 1-chip model error, PERF.md r2). `shapes`: iterable of
    (in_dim, out_dim). Stored as (t_fwd + t_bwd) / 3 per example so the
    model's bwd = 2x fwd convention reproduces the measured total."""
    import time

    import jax
    import jax.numpy as jnp

    costs = dict(spec.dense_costs)
    todo = [
        (int(di), int(do)) for di, do in shapes
        if f"{int(di)}x{int(do)}" not in costs
    ]
    if not todo:
        return spec
    dispatch_s = measure_dispatch_latency()
    for di, do in todo:
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, di),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (do, di),
                              jnp.bfloat16) * 0.02
        b = jnp.zeros((do,), jnp.float32)

        @jax.jit
        def loop(x, w, b):
            def fwdbwd(c, k):
                xk = x + k.astype(jnp.bfloat16) * 0.01  # defeat hoisting

                def f(w, xk):
                    y = jax.nn.relu(
                        jnp.dot(xk, w.T,
                                preferred_element_type=jnp.float32) + b
                    )
                    return jnp.sum(y)

                val, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, xk)
                return c + val + jnp.sum(gw.astype(jnp.float32)) * 0.0 + (
                    jnp.sum(gx.astype(jnp.float32)) * 0.0
                ), 0.0

            c, _ = jax.lax.scan(
                fwdbwd, jnp.zeros(()),
                jnp.arange(repeats, dtype=jnp.float32),
            )
            return c

        _ = float(loop(x, w, b))
        t0 = time.perf_counter()
        _ = float(loop(x, w, b))
        # the timed region carries exactly ONE dispatch+readback round
        # trip; through a remote tunnel that is ~2.5-26 ms and would
        # swamp small layers at low repeat counts (round-5 fix: the
        # un-subtracted term inflated dense costs ~100x at repeats=8)
        t_fb = max(
            (time.perf_counter() - t0 - dispatch_s) / repeats, 1e-7
        )
        costs[f"{di}x{do}"] = t_fb / 3.0 / batch * 1e6  # us per example
    return dataclasses.replace(spec, dense_costs=costs)


def op_cost_sig(op) -> str:
    """Shape signature keying the measured-op cost table: op type + input
    + output shapes discriminate every cost-relevant attribute (conv
    kernel/stride/padding show up in the param and output shapes; the
    fused activation epilogue rides the signature too)."""
    ins = ",".join("x".join(map(str, t.shape)) for t in op.inputs)
    outs = ",".join("x".join(map(str, t.shape)) for t in op.outputs)
    prm = ",".join("x".join(map(str, p.shape)) for p in op.params)
    act = getattr(op, "activation", "")
    return f"{op.op_type.name}|{ins}|{outs}|{prm}|{act}"


def measurable_graph_ops(graph):
    """The non-Linear MXU ops whose costs the generic harness can measure:
    float inputs, real fwd+bwd (Linear rides calibrate_dense; embeddings
    ride the packed calibrations)."""
    from ..ffconst import OperatorType

    kinds = (OperatorType.OP_CONV2D, OperatorType.OP_BATCHMATMUL,
             OperatorType.OP_MULTIHEAD_ATTENTION, OperatorType.OP_LSTM)
    return [op for op in graph.compute_ops if op.op_type in kinds]


def calibrate_graph_ops(spec: MachineSpec, graph, repeats: int = 20,
                        compute_dtype=None) -> MachineSpec:
    """Measure fwd+bwd of the model's conv/batch-matmul/attention ops at
    their REAL shapes by running op.forward under value_and_grad — the
    generic analog of the reference's Op::measure_operator_cost
    (src/runtime/model.cu:20-64), cached like dense_costs."""
    import time

    import jax
    import jax.numpy as jnp

    from ..core.graph import OpContext

    costs = dict(spec.op_costs)
    todo = [
        op for op in measurable_graph_ops(graph)
        if op_cost_sig(op) not in costs
    ]
    if not todo:
        return spec
    cdt = compute_dtype or jnp.bfloat16
    dispatch_s = measure_dispatch_latency()
    for op in todo:
        key = jax.random.PRNGKey(0)
        xs = [
            jax.random.normal(jax.random.fold_in(key, 7 + i), t.shape,
                              jnp.float32)
            for i, t in enumerate(op.inputs)
        ]
        params = op.init_params(key)
        ctx = OpContext(training=True, rng=key, compute_dtype=cdt)
        batch = op.outputs[0].shape[0] if op.outputs else 1

        @jax.jit
        def loop(params, xs):
            def fwdbwd(c, k):
                def f(params, xs):
                    outs = op.forward(
                        # defeat loop hoisting: perturb inputs per step
                        params, [x + k * 1e-3 for x in xs], ctx
                    )
                    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

                val, (gp, gx) = jax.value_and_grad(f, argnums=(0, 1))(
                    params, xs
                )
                extra = sum(
                    jnp.sum(g.astype(jnp.float32)) * 0.0
                    for g in jax.tree_util.tree_leaves((gp, gx))
                )
                return c + val + extra, 0.0

            c, _ = jax.lax.scan(
                fwdbwd, jnp.zeros(()),
                jnp.arange(repeats, dtype=jnp.float32),
            )
            return c

        _ = float(loop(params, xs))
        t0 = time.perf_counter()
        _ = float(loop(params, xs))
        t_fb = max(
            (time.perf_counter() - t0 - dispatch_s) / repeats, 1e-7
        )
        costs[op_cost_sig(op)] = t_fb / 3.0 / max(batch, 1) * 1e6
    return dataclasses.replace(spec, op_costs=costs)


def graph_dense_shapes(graph):
    """(in_dim, out_dim) of every Dense op in a graph (calibration input)."""
    out = []
    for op in graph.compute_ops:
        if hasattr(op, "in_dim") and hasattr(op, "out_dim") and hasattr(
            op, "activation"
        ):
            out.append((op.in_dim, op.out_dim))
    return sorted(set(out))


def calibrate_or_cached(spec: MachineSpec, cache_path: str) -> MachineSpec:
    """Auto-calibration at first compile (reference: profile-then-simulate,
    measured per-op costs cached across the search): load the cached
    machine file if present, else measure on the device and write it."""
    import os

    if cache_path and os.path.exists(cache_path):
        cached = MachineSpec.from_file(cache_path)
        return dataclasses.replace(
            cached,
            num_chips=spec.num_chips, chips_per_host=spec.chips_per_host,
            ici_axis_x=spec.ici_axis_x, ici_axis_y=spec.ici_axis_y,
            ici_domain=spec.ici_domain, model_axis=spec.model_axis,
        )
    spec = calibrate(spec)
    spec = calibrate_packed_gather(spec)
    spec = calibrate_stream_mode(spec)
    # calibrate_packed runs LAST so its fitted constants reflect the
    # stream-mode winner the runtime will actually use
    spec = calibrate_packed(spec)
    if cache_path:
        spec.save(cache_path)
    return spec
