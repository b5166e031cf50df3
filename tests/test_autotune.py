"""Autotuner tests: native cost model, DAG scheduler, MCMC search, and the
compile-time strategy-search integration.

The reference had no simulator/search unit tests at all (SURVEY §4 gap) —
these cover the capability directly.
"""
import numpy as np
import pytest

from dlrm_flexflow_tpu import FFConfig, LossType, SGDOptimizer
from dlrm_flexflow_tpu.ffconst import DataType
from dlrm_flexflow_tpu.autotune import bindings
from dlrm_flexflow_tpu.autotune.machine import MachineSpec, preset
from dlrm_flexflow_tpu.autotune.search import autotune_plan, graph_to_cost_spec
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan


def machine8():
    return preset("tpu_v5e", num_chips=8, chips_per_host=8)


def embed_op(vocab, dim=16, lookups=8192.0):
    return {
        "kind": bindings.KIND_EMBED,
        "table_rows": float(vocab),
        "row_bytes": 4.0 * dim,
        "lookups": lookups,
    }


def test_simulate_monotonic_in_load():
    m = machine8().to_native()
    ops = [embed_op(1e6) for _ in range(8)]
    balanced = list(range(8))
    skewed = [0] * 8
    assert bindings.simulate(m, ops, balanced) < bindings.simulate(m, ops, skewed)


def test_breakdown_sums_to_total():
    m = machine8().to_native()
    ops = [embed_op(1e6), {"kind": bindings.KIND_DENSE, "flops": 1e9, "bytes": 1e7, "param_bytes": 1e6}]
    b = bindings.breakdown(m, ops, [0])
    parts = sum(v for k, v in b.items() if k != "total_us")
    assert parts == pytest.approx(b["total_us"], rel=1e-9)


def test_mcmc_recovers_balanced_placement():
    m = machine8().to_native()
    # two huge tables + small ones: huge tables must land on distinct chips
    ops = [embed_op(2e7), embed_op(2e7)] + [embed_op(100) for _ in range(6)]
    owner, cost = bindings.mcmc_search(m, ops, [0] * 8, budget=5000, alpha=0.5, seed=3)
    assert owner[0] != owner[1]
    rr_cost = bindings.simulate(m, ops, [i % 8 for i in range(8)])
    assert cost <= rr_cost * 1.001


def test_mem_penalty_forces_spread():
    # tables that do not fit on one chip must spread even if comm were free
    spec = preset("tpu_v5e", num_chips=4, chips_per_host=4)
    spec.hbm_capacity_gb = 1.0
    m = spec.to_native()
    # 4 x 4GB tables (1e7 rows x 100 floats)
    ops = [embed_op(1e7, dim=100, lookups=1024.0) for _ in range(4)]
    owner, cost = bindings.mcmc_search(m, ops, [0, 0, 0, 0], budget=4000, alpha=0.1, seed=0)
    assert sorted(owner) == [0, 1, 2, 3], owner


def test_dag_scheduler_chains_and_collectives():
    # device0: 10us, device1: 20us, then a collective 5us on both
    ms = bindings.schedule_dag(2, [10.0, 20.0, 5.0], [0, 1, -1], [(0, 2), (1, 2)])
    assert ms == 25.0
    # serial chain on one device
    ms = bindings.schedule_dag(1, [3.0, 4.0], [0, 0], [(0, 1)])
    assert ms == 7.0
    # independent tasks on one device serialize
    ms = bindings.schedule_dag(1, [3.0, 4.0], [0, 0], [])
    assert ms == 7.0
    # on two devices they overlap
    ms = bindings.schedule_dag(2, [3.0, 4.0], [0, 1], [])
    assert ms == 4.0


def test_graph_to_cost_spec_covers_dlrm():
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[1000, 2000, 50],
        mlp_bot=[4, 8],
        mlp_top=[32, 8, 1],
        batch_size=64,
    )
    model = make_dlrm_model(cfg, FFConfig(batch_size=64))
    ops, names = graph_to_cost_spec(model.graph, 64)
    assert len(names) == 3
    kinds = [o["kind"] for o in ops]
    assert kinds.count(bindings.KIND_EMBED) == 3
    assert kinds.count(bindings.KIND_DENSE) == 3  # 1 bot + 2 top dense layers


def test_compile_with_search_budget_sets_assignment():
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[500000, 400000, 10, 20, 300000, 40, 50, 60],
        embedding_bag_size=1,
        mlp_bot=[4, 8],
        mlp_top=[72, 8, 1],
        batch_size=64,
    )
    ffc = FFConfig(batch_size=64, compute_dtype="float32",
                   search_budget=3000, search_alpha=0.5,
                   onehot_embedding_threshold=0)
    model = make_dlrm_model(cfg, ffc)
    mesh = make_mesh()
    plan = dlrm_hybrid_plan()
    plan.table_assignment = None
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [], mesh=mesh, plan=plan)
    # the joint search may replicate small tables (mode axis); the
    # assignment then covers exactly the placed ones
    assert plan.table_assignment is not None
    n_repl = len(plan.replicated_tables or [])
    assert len(plan.table_assignment) + n_repl == 8
    # the three big tables must be placed on three distinct shards
    repl = set(plan.replicated_tables or [])
    assert not repl & {0, 1, 4}, "big tables must not be replicated"
    placed_order = [i for i in range(8) if i not in repl]
    big = [
        plan.table_assignment[placed_order.index(i)] for i in (0, 1, 4)
    ]
    assert len(set(big)) == 3, plan.table_assignment
    # and it still trains
    feeds, labels = random_batches(cfg, 64, seed=0)
    assert np.isfinite(float(model.train_batch(feeds, labels)))


def test_machine_spec_file_roundtrip(tmp_path):
    spec = preset("tpu_v5p", num_chips=16)
    path = str(tmp_path / "machine.json")
    spec.save(path)
    loaded = MachineSpec.from_file(path)
    assert loaded == spec


def test_calibrate_measures_positive_bandwidth():
    """profile-then-simulate hook (reference: inner_measure_operator_cost,
    model.cu:20-64): measured gather/scatter bandwidth folds into the spec."""
    from dlrm_flexflow_tpu.autotune.machine import calibrate, preset

    spec = preset("cpu_sim", num_chips=1)
    out = calibrate(spec, dim=8, vocab=1024, batch=64, repeats=3)
    assert out.gather_gbps > 0 and out.scatter_gbps > 0
    assert out.mxu_tflops == spec.mxu_tflops  # only bw fields updated


def test_split_search_spreads_hot_table():
    """One huge-lookup table + tiny ones on 8 chips: the split search must
    row-split the hot table (per-table work otherwise caps scaling —
    PERF.md)."""
    from dlrm_flexflow_tpu.autotune.machine import preset
    from dlrm_flexflow_tpu.autotune.search import autotune_plan
    from dlrm_flexflow_tpu.config import FFConfig
    from dlrm_flexflow_tpu.core.ffmodel import FFModel
    from dlrm_flexflow_tpu.parallel.passes import fuse_embedding_tables
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

    m = FFModel(FFConfig(batch_size=4096))
    xs = [m.create_tensor([4096, 1], dtype=DataType.DT_INT64, name=f"s{i}")
          for i in range(4)]
    for i, x in enumerate(xs):
        m.embedding(x, 1_000_000 if i == 0 else 20_000, 16)
    fuse_embedding_tables(m.graph, dlrm_hybrid_plan(), 8)

    machine = preset("tpu_v5e", num_chips=8, chips_per_host=8)
    owner, cost, report = autotune_plan(
        m.graph, machine, 4096 * 8, budget=2000, search_splits=True, seed=1
    )
    split = report["table_split"]
    base_owner, base_cost, _ = autotune_plan(
        m.graph, machine, 4096 * 8, budget=2000, search_splits=False, seed=1
    )
    assert split[0] > 1, f"hot table not split: {split}"
    assert cost < base_cost, (cost, base_cost)
    assert len(owner) == sum(split)


def test_split_search_tiny_vocab_tables_compile():
    """Regression: split proposals must cap at the table's vocab (a 3-row
    table can't split 4 ways) and the returned owner vector must match the
    layout's sub-table expansion — kaggle has vocab-3/4/10 tables."""
    from dlrm_flexflow_tpu.parallel.mesh import make_mesh
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
    from dlrm_flexflow_tpu import MetricsType

    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[1460, 583, 1_013_122, 3, 4, 10],
        embedding_bag_size=1,
        mlp_bot=[4, 16, 8],
        mlp_top=[56, 16, 1],
        batch_size=16,
    )
    ffc = FFConfig(batch_size=16, compute_dtype="float32",
                   onehot_embedding_threshold=0)
    ffc.search_budget = 500
    m = make_dlrm_model(cfg, ffc)
    m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
              [MetricsType.METRICS_ACCURACY], mesh=make_mesh(),
              plan=dlrm_hybrid_plan())
    feeds, labels = random_batches(cfg, 16, seed=0)
    loss = m.train_batch(feeds, labels)
    assert np.isfinite(float(loss))


def test_mode_choice_places_small_tables_at_scale():
    """At high chip counts replicating small tables costs a dense-grad
    allreduce every step; the search may fold them into the collection.
    Verify the mode search runs and the runtime honors an explicit
    replicated_tables choice end-to-end."""
    from dlrm_flexflow_tpu.autotune.machine import preset
    from dlrm_flexflow_tpu.autotune.search import autotune_plan
    from dlrm_flexflow_tpu.core.ffmodel import FFModel
    from dlrm_flexflow_tpu.parallel.passes import fuse_embedding_tables
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

    m = FFModel(FFConfig(batch_size=1024))
    for i, v in enumerate([2_000_000, 1_500_000, 4000, 2000]):
        x = m.create_tensor([1024, 1], dtype=DataType.DT_INT64, name=f"s{i}")
        m.embedding(x, v, 16)
    machine = preset("tpu_v5e", num_chips=8, chips_per_host=4)
    owner, cost, report = autotune_plan(
        m.graph, machine, 1024 * 8, budget=800, min_vocab=8192, seed=0
    )
    assert "replicated_tables" in report
    # runtime honors an explicit choice: exclude table 3 only
    plan = dlrm_hybrid_plan()
    plan.replicated_tables = [3]
    coll = fuse_embedding_tables(m.graph, plan, 8, min_vocab=8192)
    assert coll is not None and coll.layout.num_tables == 3


def test_segmentation_and_overlap_flags_shape_costs():
    """reference parity: --simulator-segment-size adds pipelined-segment
    latency; --search-overlap-backward-update hides allreduce under the
    backward sweep (simulator.cc:218-288, 403-498)."""
    import dataclasses

    from dlrm_flexflow_tpu.autotune import bindings
    from dlrm_flexflow_tpu.autotune.machine import preset

    spec = preset("tpu_v5e", num_chips=8, chips_per_host=4)
    ops = [
        {"kind": bindings.KIND_DENSE, "flops": 5e9, "bytes": 2e8, "param_bytes": 4e8},
        {"kind": bindings.KIND_EMBED, "table_rows": 1e6, "row_bytes": 64.0,
         "lookups": 65536.0},
    ]
    base = bindings.simulate(spec.to_native(), ops, [0], 0.0)
    # many small segments -> more latency
    seg = dataclasses.replace(spec, segment_bytes=4096.0, max_segments=1e9)
    assert bindings.simulate(seg.to_native(), ops, [0], 0.0) > base
    # overlap -> cheaper (hides part of the big allreduce)
    ov = dataclasses.replace(spec, overlap_backward_update=1.0)
    assert bindings.simulate(ov.to_native(), ops, [0], 0.0) < base


def test_hierarchical_a2a_cheaper_than_flat_across_hosts():
    """With split tables spanning a multi-host mesh, the hierarchical
    exchange (ICI combine then per-(host,table) DCN rows) must beat the flat
    all-to-all in the model; on one host both degenerate to the same ICI
    exchange."""
    import dataclasses

    def ops_split(s):
        # 4 tables split s ways each: sub_count drives the DCN term
        out = []
        for _ in range(4):
            for _ in range(s):
                out.append({
                    "kind": bindings.KIND_EMBED,
                    "table_rows": 1e6 / s,
                    "row_bytes": 64.0,
                    "lookups": 65536.0 / s,
                    "pooled_rows": 65536.0,
                    "sub_count": float(s),
                })
        return out

    multi = preset("tpu_v5e", num_chips=32, chips_per_host=8)
    flat = dataclasses.replace(multi, hierarchical_a2a=0.0)
    ops = ops_split(8)
    owner = list(range(len(ops)))
    b_h = bindings.breakdown(multi.to_native(), ops, [o % 32 for o in owner])
    b_f = bindings.breakdown(flat.to_native(), ops, [o % 32 for o in owner])
    assert b_h["all2all_us"] < b_f["all2all_us"] * 0.5  # ~8x less DCN payload
    # unsplit tables: hierarchical ~ flat (same table_payload == slot_payload,
    # ICI stage added but DCN dominates)
    ops1 = ops_split(1)
    o1 = [i % 32 for i in range(len(ops1))]
    b1_h = bindings.breakdown(multi.to_native(), ops1, o1)
    b1_f = bindings.breakdown(flat.to_native(), ops1, o1)
    assert b1_h["all2all_us"] <= b1_f["all2all_us"] * 1.2
    # single host: chips_per_host == num_chips -> identical ICI exchange
    single = preset("tpu_v5e", num_chips=8, chips_per_host=8)
    sflat = dataclasses.replace(single, hierarchical_a2a=0.0)
    o8 = [i % 8 for i in range(len(ops))]
    assert bindings.simulate(single.to_native(), ops, o8) == pytest.approx(
        bindings.simulate(sflat.to_native(), ops, o8)
    )


def test_autotune_colocates_splits_per_host():
    """End-to-end: a multi-host search with splits returns an owner vector
    whose split sub-tables sit on distinct chips of one host, and the
    compiled plan adopts chips_per_host."""
    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[1_000_000] * 4 + [2_000] * 4,
        embedding_bag_size=1,
        mlp_bot=[13, 64, 16],
        mlp_top=[144, 64, 1],
        batch_size=1024,
    )
    model = make_dlrm_model(cfg, FFConfig(batch_size=1024))
    machine = preset("tpu_v5e", num_chips=16, chips_per_host=4)
    owner, cost, report = autotune_plan(
        model.graph, machine, 16 * 8192, budget=2000, seed=0,
        search_splits=True, min_vocab=8192,
    )
    split = report["table_split"]
    assert any(s > 1 for s in split)
    names = report["tables"]
    by_table = {}
    for i, nm in enumerate(names):
        by_table.setdefault(nm.rsplit("/", 1)[0], []).append(owner[i])
    for base, shards in by_table.items():
        if len(shards) <= 1:
            continue
        for lo in range(0, len(shards), 4):
            chunk = shards[lo:lo + 4]
            assert len({s // 4 for s in chunk}) == 1, (base, shards)
            assert len(set(chunk)) == len(chunk), (base, shards)
