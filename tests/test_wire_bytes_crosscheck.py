"""Cost-model ↔ runtime wire-bytes cross-check (VERDICT r2 item 8).

The autotuner's exchange terms are only trustworthy if the bytes the MODEL
charges equal the bytes the RUNTIME reports shipping. This pins
ffsim2_wire_bytes (slot_payload / domain_payload / routed_wire) to
ShardedEmbeddingLayout.step_exchange_bytes accounting for flat,
hierarchical, and routed layouts across split vectors — the analog of the
reference simulator deriving comm volumes from the very region
intersections the runtime materializes (src/runtime/simulator.cc:357-388).
"""
import numpy as np
import pytest

from dlrm_flexflow_tpu.autotune import bindings
from dlrm_flexflow_tpu.autotune.machine import preset
from dlrm_flexflow_tpu.parallel.embedding_collection import (
    ShardedEmbeddingLayout,
    expand_subtables,
)

B, DIM, BAG = 64, 16, 1
DB = 2  # bf16 wire


def _ops(vocabs):
    return [
        {
            "kind": bindings.KIND_EMBED,
            "table_rows": float(v),
            "row_bytes": 4.0 * DIM,
            "lookups": float(B * BAG),
            "pooled_rows": float(B),
            "wire_row_bytes": float(DB * DIM),
        }
        for v in vocabs
    ]


def _machine(n, cph=None, routed=0, cap=2.0):
    import dataclasses

    spec = preset("tpu_v5e", num_chips=n).torus_for(n)
    return dataclasses.replace(
        spec,
        ici_domain=cph or n,
        hierarchical_a2a=1.0 if cph else 0.0,
        routed_exchange=routed,
        routed_cap=cap,
    ).to_native()


def test_flat_slot_payload_matches_runtime():
    """Balanced split layout: model slot_payload x (n-1)/n must EQUAL the
    runtime's pooled_exchange_bytes (no padding slop when every shard
    carries t_max real slots)."""
    n = 4
    vocabs = [1000, 800, 1200, 900]
    split = [2, 2, 2, 2]
    subs = expand_subtables(vocabs, split)
    owner_subs = [0, 1, 0, 1, 2, 3, 2, 3]
    lay = ShardedEmbeddingLayout(vocabs, DIM, n, owner_subs, split=split)
    assert lay.t_max * n == len(subs)  # balanced: no dead slots
    model = bindings.wire_bytes(
        _machine(n), _ops(vocabs), [0, 0, 2, 2], split, [0] * 4
    )
    runtime_fwd = lay.pooled_exchange_bytes(B, DB)
    assert model["slot_payload"] * (n - 1) / n == pytest.approx(runtime_fwd)
    # the step total = 3 payload directions + 2 index exchanges, all made
    # of the same slot volume — ratio is exact in the balanced case
    idx = 4 * B * n * lay.t_max * BAG * (n - 1) // n
    assert lay.step_exchange_bytes(B, BAG, DB) == pytest.approx(
        3 * runtime_fwd + 2 * idx
    )


def test_flat_unbalanced_runtime_at_most_padding_above_model():
    """Unbalanced placement: the runtime ships dead padded slots, so its
    bytes may exceed the model's by at most the t_max padding factor."""
    n = 4
    vocabs = [1000, 800, 1200]
    split = [2, 1, 1]
    subs = expand_subtables(vocabs, split)
    owner_subs = [0, 0, 1, 2]  # shard 0 carries 2 subs -> t_max 2, 8 slots
    lay = ShardedEmbeddingLayout(vocabs, DIM, n, owner_subs, split=split)
    model = bindings.wire_bytes(
        _machine(n), _ops(vocabs), [0, 1, 2], split, [0] * 3
    )
    runtime_fwd = lay.pooled_exchange_bytes(B, DB)
    model_fwd = model["slot_payload"] * (n - 1) / n
    pad_factor = lay.t_max * n / len(subs)
    assert model_fwd <= runtime_fwd <= model_fwd * pad_factor + 1e-9


def test_hierarchical_dcn_payload_matches_runtime():
    """Host-co-located splits: model domain_payload x (h-1)/h must equal
    the runtime's DCN byte report (one row per (host, table))."""
    n, cph = 4, 2
    vocabs = [1000, 800, 1200, 900]
    split = [2, 2, 2, 2]
    owner_subs = [0, 1, 0, 1, 2, 3, 2, 3]  # tables 0,1 on host0; 2,3 on host1
    lay = ShardedEmbeddingLayout(
        vocabs, DIM, n, owner_subs, split=split, chips_per_host=cph
    )
    assert lay.hierarchical
    h = n // cph
    model = bindings.wire_bytes(
        _machine(n, cph=cph), _ops(vocabs), [0, 0, 2, 2], split, [0] * 4
    )
    runtime_dcn = lay.dcn_pooled_exchange_bytes(B, DB)
    assert model["domain_payload"] * (h - 1) / h == pytest.approx(runtime_dcn)


@pytest.mark.parametrize("split_vec", [[1, 1, 1, 1], [2, 2, 2, 2],
                                       [4, 2, 1, 1]])
def test_routed_wire_matches_runtime(split_vec):
    """Routed mode: model routed_wire x (n-1)/n must equal the runtime's
    step_exchange_bytes exactly (2 idx + 2 payload rows per capacity
    entry; capacities divide evenly here so round8 introduces no slop)."""
    n = 4
    cap = 2.0
    vocabs = [1024, 896, 1280, 960]
    subs = expand_subtables(vocabs, split_vec)
    owner_subs = [i % n for i in range(len(subs))]
    lay = ShardedEmbeddingLayout(
        vocabs, DIM, n, owner_subs, split=split_vec, exchange="routed",
        routed_cap_factor=cap,
    )
    owner_t = []
    i = 0
    for s in split_vec:
        owner_t.append(owner_subs[i])
        i += s
    model = bindings.wire_bytes(
        _machine(n, routed=1, cap=cap), _ops(vocabs), owner_t, split_vec,
        [0] * 4,
    )
    runtime = lay.step_exchange_bytes(B, BAG, DB)
    assert model["routed_wire"] * (n - 1) / n == pytest.approx(
        runtime, rel=1e-9
    )


def test_routed_reported_bytes_match_actual_bucket_capacities():
    """The runtime's reported routed bytes must agree with the ACTUAL
    capacity buckets the exchange ships (RoutedPlan.slot_cap), within the
    per-bucket round8 padding."""
    from dlrm_flexflow_tpu.parallel.routed_exchange import RoutedPlan

    n = 4
    cap = 2.0
    vocabs = [1024, 896, 1280, 960]
    split_vec = [2, 2, 1, 4]
    subs = expand_subtables(vocabs, split_vec)
    owner_subs = [i % n for i in range(len(subs))]
    lay = ShardedEmbeddingLayout(
        vocabs, DIM, n, owner_subs, split=split_vec, exchange="routed",
        routed_cap_factor=cap,
    )
    b_loc = B // n
    plan = RoutedPlan(lay, b_loc, BAG, cap)
    total_caps = int(np.sum(plan.slot_cap))  # entries shipped per chip
    reported_entries = 0.0
    for t, s in enumerate(split_vec):
        c_eff = 1.0 if (s == 1 or cap <= 0) else cap
        reported_entries += b_loc * BAG * c_eff
    # per-sub round8 + the min(me, .) clamp bound the gap
    assert reported_entries <= total_caps + 1e-9
    assert total_caps <= reported_entries + 8 * len(subs)
