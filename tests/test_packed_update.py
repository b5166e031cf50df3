"""Packed-layout embedding tables + Pallas packed-update kernel (CPU
interpret mode; the TPU-compiled path is exercised by bench/PERF runs).

Reference analog for semantics: the embedding backward scatter-add
(reference: src/ops/embedding.cu:192-217) fused with the optimizer update
(src/runtime/optimizer_kernel.cu:44-113)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu.ops.pallas import packed_update as pu


@pytest.mark.parametrize(
    "v,d,k,c",
    [(1000, 16, 256, 32), (333, 64, 128, 16), (64, 128, 500, 8), (5000, 32, 3000, 64)],
)
def test_kernel_parity_interpret(v, d, k, c):
    rng = np.random.RandomState(0)
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table), chunk_packs=c)
    rows = rng.randint(0, v + 5, k).astype(np.int32)  # some dropped
    deltas = rng.randn(k, d).astype(np.float32)
    ref = pu.packed_row_update_reference(
        packed, jnp.asarray(rows), jnp.asarray(deltas), v, d
    )
    got = pu.packed_row_update(
        packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "v,d,k,c",
    [(1000, 16, 256, 32), (333, 64, 128, 16), (64, 128, 500, 8),
     (5000, 32, 3000, 64), (777, 8, 1111, 32)],
)
def test_kernel_parity_compact_stream(v, d, k, c):
    """The compact stream mode (in-kernel lane expansion: dense-packed
    [K/rpp, 128] payload + rpp static rolls selected by roll class) must
    match the scatter oracle bit-for-bit like the expanded mode, including
    duplicates, drops, negatives, and the rpp=1 (d=128) degenerate case."""
    rng = np.random.RandomState(7)
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table), chunk_packs=c)
    rows = rng.randint(-3, v + 5, k).astype(np.int32)  # drops both sides
    deltas = rng.randn(k, d).astype(np.float32)
    ref = pu.packed_row_update_reference(
        packed, jnp.asarray(np.where(rows < 0, v, rows)), jnp.asarray(deltas),
        v, d,
    )
    prev = pu.get_stream_mode()
    try:
        pu.set_stream_mode("compact")
        got = pu.packed_row_update(
            packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
            chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
        )
    finally:
        pu.set_stream_mode(prev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_compact_stream_lazy_adam_matches_expanded():
    """Lazy Adam's three pool passes under the compact stream must equal
    the expanded-stream result exactly (same sorted streams, same math)."""
    rng = np.random.RandomState(8)
    v, d, k, c = 400, 16, 333, 32
    table = pu.pack_table(
        jnp.asarray(rng.randn(v, d).astype(np.float32)), chunk_packs=c
    )
    m = jnp.zeros_like(table)
    vv = jnp.zeros_like(table)
    rows = jnp.asarray(rng.randint(0, v, k).astype(np.int32))
    grads = jnp.asarray(rng.randn(k, d).astype(np.float32))
    kw = dict(alpha_t=0.01, beta1=0.9, beta2=0.99, epsilon=1e-8,
              chunk_packs=c, interpret=True)
    prev = pu.get_stream_mode()
    try:
        pu.set_stream_mode("expanded")
        t1, m1, v1 = pu.packed_lazy_adam_batched(
            [table], [m], [vv], [rows], [grads], [v], d, **kw)
        pu.set_stream_mode("compact")
        t2, m2, v2 = pu.packed_lazy_adam_batched(
            [table], [m], [vv], [rows], [grads], [v], d, **kw)
    finally:
        pu.set_stream_mode(prev)
    for a, b in zip((t1[0], m1[0], v1[0]), (t2[0], m2[0], v2[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_kernel_batched_multi_table():
    rng = np.random.RandomState(1)
    vocabs = [900, 1300, 77]
    d, k, c = 16, 512, 32
    tables = [rng.randn(v, d).astype(np.float32) for v in vocabs]
    packs = [pu.pack_table(jnp.asarray(t), chunk_packs=c) for t in tables]
    rows = [rng.randint(0, v, k).astype(np.int32) for v in vocabs]
    deltas = [rng.randn(k, d).astype(np.float32) for _ in vocabs]
    outs = pu.packed_row_update_batched(
        packs, [jnp.asarray(r) for r in rows],
        [jnp.asarray(g) for g in deltas], vocabs, d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
    )
    for t, r, g, o, v in zip(tables, rows, deltas, outs, vocabs):
        expect = t.copy()
        np.add.at(expect, r, g)
        np.testing.assert_allclose(
            np.asarray(pu.unpack_table(o, v, d)), expect, atol=1e-4
        )


def test_pack_roundtrip_and_gather():
    rng = np.random.RandomState(2)
    v, d = 1000, 16
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table))
    np.testing.assert_array_equal(
        np.asarray(pu.unpack_table(packed, v, d)), table
    )
    rows = rng.randint(0, v, 777).astype(np.int32)
    got = pu.packed_gather(packed, jnp.asarray(rows), d)
    np.testing.assert_array_equal(np.asarray(got), table[rows])


@pytest.mark.parametrize("d", [16, 32, 64, 128])
def test_subpack_gather_parity(d):
    """packed_gather_subpack (lane-sliced lax.gather, D*4 logical
    bytes/row) must match the whole-pack fetch+mask path bit-for-bit,
    including d=128 where a pack IS a row."""
    rng = np.random.RandomState(3)
    v = 517
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table))
    rows = rng.randint(0, v, 333).astype(np.int32)
    got = pu.packed_gather_subpack(packed, jnp.asarray(rows), d)
    np.testing.assert_array_equal(np.asarray(got), table[rows])


def test_gather_mode_dispatch():
    """set_gather_mode routes every gather_rows call site; both modes
    agree and the mode always restores (module-global state)."""
    rng = np.random.RandomState(4)
    v, d = 200, 16
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table))
    rows = jnp.asarray(rng.randint(0, v, 64).astype(np.int32))
    prev = pu.get_gather_mode()
    try:
        pu.set_gather_mode("subpack")
        a = np.asarray(pu.gather_rows(packed, rows, d))
        pu.set_gather_mode("pack")
        b = np.asarray(pu.gather_rows(packed, rows, d))
    finally:
        pu.set_gather_mode(prev)
    np.testing.assert_array_equal(a, b)


def test_compile_applies_gather_mode(tmp_path, monkeypatch):
    """FFConfig.packed_gather_mode is applied at compile (before any step
    tracing); 'auto' reads the calibration cache's winner and defaults to
    'pack' without one."""
    import json

    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer

    monkeypatch.chdir(tmp_path)  # hermetic .ffsim_machine.json lookup
    prev = pu.get_gather_mode()
    try:
        cfg, model = _small_dlrm("on")
        model.config.packed_gather_mode = "subpack"
        model.compile(
            optimizer=SGDOptimizer(lr=0.1),
            loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
            metrics=[MetricsType.METRICS_ACCURACY],
        )
        assert pu.get_gather_mode() == "subpack"
        model.config.packed_gather_mode = "auto"
        model.compile(
            optimizer=SGDOptimizer(lr=0.1),
            loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
            metrics=[MetricsType.METRICS_ACCURACY],
        )
        assert pu.get_gather_mode() == "pack"
        # a calibration cache carrying the measured winners is honored,
        # including per-dim overrides (reference: per-(op,config) measured
        # costs, model.cu:20-64)
        (tmp_path / ".ffsim_machine.json").write_text(
            json.dumps({"gather_mode": "subpack",
                        "gather_mode_by_dim": {"64": "pack"},
                        "stream_mode": "compact",
                        "stream_mode_by_dim": {"64": "expanded"}})
        )
        model.compile(
            optimizer=SGDOptimizer(lr=0.1),
            loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
            metrics=[MetricsType.METRICS_ACCURACY],
        )
        assert pu.get_gather_mode() == "subpack"
        assert pu.get_gather_mode(16) == "subpack"  # default applies
        assert pu.get_gather_mode(64) == "pack"     # per-dim override
        assert pu.get_stream_mode(16) == "compact"
        assert pu.get_stream_mode(64) == "expanded"
    finally:
        pu.set_gather_mode(prev)
        pu.set_stream_mode("expanded")


def _small_dlrm(packed_flag):
    from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[500, 300, 800],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 16],
        mlp_top=[64, 16, 1],
        batch_size=32,
    )
    ffc = FFConfig(
        batch_size=32, compute_dtype="float32",
        onehot_embedding_threshold=0, packed_tables=packed_flag,
    )
    model = make_dlrm_model(cfg, ffc)
    return cfg, model


def test_packed_training_matches_scatter_path():
    """End-to-end: the packed engine (interpret kernels on CPU) must track
    the XLA scatter path step for step."""
    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    losses = {}
    weights = {}
    for flag in ("off", "on"):
        cfg, model = _small_dlrm(flag)
        model.compile(
            SGDOptimizer(lr=0.05),
            LossType.LOSS_BINARY_CROSSENTROPY,
            [MetricsType.METRICS_ACCURACY],
        )
        packed_ops = [
            op for op in model.graph.compute_ops
            if getattr(op, "packed", False)
        ]
        if flag == "on":
            assert len(packed_ops) == 3, "all three tables should pack"
        else:
            assert not packed_ops
        feeds, labels = random_batches(cfg, 32 * 4, seed=3)
        ls = []
        for i in range(4):
            batch = {k: v[32 * i : 32 * (i + 1)] for k, v in feeds.items()}
            ls.append(model.train_batch(batch, labels[32 * i : 32 * (i + 1)]))
        losses[flag] = ls
        weights[flag] = model.get_weights("table_0")["weight"]
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=2e-3, atol=2e-3)
    # bf16 delta rounding bounds the weight divergence
    np.testing.assert_allclose(
        weights["on"], weights["off"], atol=5e-3
    )


def test_packed_adagrad_matches_scatter_path():
    from dlrm_flexflow_tpu import LossType, MetricsType
    from dlrm_flexflow_tpu.training.optimizer import RowWiseAdagradOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    losses = {}
    for flag in ("off", "on"):
        cfg, model = _small_dlrm(flag)
        model.compile(
            RowWiseAdagradOptimizer(lr=0.05),
            LossType.LOSS_BINARY_CROSSENTROPY,
            [MetricsType.METRICS_ACCURACY],
        )
        feeds, labels = random_batches(cfg, 32 * 3, seed=4)
        ls = []
        for i in range(3):
            batch = {k: v[32 * i : 32 * (i + 1)] for k, v in feeds.items()}
            ls.append(model.train_batch(batch, labels[32 * i : 32 * (i + 1)]))
        losses[flag] = ls
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=5e-3, atol=5e-3)


def test_packed_weight_io_roundtrip():
    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer

    _, model = _small_dlrm("on")
    model.compile(
        SGDOptimizer(lr=0.01),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
    )
    w = model.get_weights("table_0")["weight"]
    assert w.shape == (500, 16), "get_weights must unpack to logical shape"
    w2 = np.random.RandomState(5).randn(500, 16).astype(np.float32)
    model.set_weights("table_0", {"weight": w2})
    np.testing.assert_allclose(model.get_weights("table_0")["weight"], w2, atol=1e-6)


def test_host_routes_match_device_sort():
    """host_pack_routes must reproduce the device prep's stream exactly
    (same encoded stream content per chunk and same starts)."""
    rng = np.random.RandomState(8)
    v, d, k, c = 5000, 16, 2048, 64
    rows = rng.randint(0, v + 10, k).astype(np.int64)
    deltas = rng.randn(k, d).astype(np.float32)
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table), chunk_packs=c)
    order, enc, starts = pu.host_pack_routes(rows, v, d, c)
    got = pu.packed_row_update(
        packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
        routes=[(jnp.asarray(order), jnp.asarray(enc), jnp.asarray(starts))],
    )
    ref = pu.packed_row_update_reference(
        packed, jnp.asarray(rows), jnp.asarray(deltas), v, d
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # host routes + compact stream (in-kernel lane expansion) compose: the
    # encode step rides AFTER route injection
    prev = pu.get_stream_mode()
    try:
        pu.set_stream_mode("compact")
        got_c = pu.packed_row_update(
            packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
            chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
            routes=[(jnp.asarray(order), jnp.asarray(enc),
                     jnp.asarray(starts))],
        )
    finally:
        pu.set_stream_mode(prev)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref), atol=1e-4)


def test_modes_survive_interleaved_compiles():
    """Modes are read at TRACE time (first call), so model A compiled with
    one winner must re-apply it even if model B's compile changed the
    globals in between."""
    import numpy as _np

    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    prev = pu.get_gather_mode()
    try:
        cfg_a, model_a = _small_dlrm("on")
        model_a.config.packed_gather_mode = "subpack"
        model_a.config.packed_stream_mode = "compact"
        model_a.compile(
            optimizer=SGDOptimizer(lr=0.1),
            loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
            metrics=[MetricsType.METRICS_ACCURACY],
        )
        cfg_b, model_b = _small_dlrm("on")
        model_b.config.packed_gather_mode = "pack"
        model_b.config.packed_stream_mode = "expanded"
        model_b.compile(
            optimizer=SGDOptimizer(lr=0.1),
            loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
            metrics=[MetricsType.METRICS_ACCURACY],
        )
        assert pu.get_gather_mode() == "pack"  # B's compile moved the global
        feeds, labels = random_batches(cfg_a, 32, seed=3)
        loss = model_a.train_batch(feeds, labels)
        assert _np.isfinite(float(loss))
        # A's entry point re-applied A's own winners before tracing
        assert pu.get_gather_mode() == "subpack"
        assert pu.get_stream_mode() == "compact"
    finally:
        pu.set_gather_mode(prev)
        pu.set_stream_mode("expanded")


def test_host_routing_model_matches_device_sort_path():
    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    losses = {}
    for routing in (False, True):
        cfg, model = _small_dlrm("on")
        model.config.host_routing = routing
        model.compile(
            SGDOptimizer(lr=0.05),
            LossType.LOSS_BINARY_CROSSENTROPY,
            [MetricsType.METRICS_ACCURACY],
        )
        assert model._route_ops, "packed ops expected"
        feeds, labels = random_batches(cfg, 32 * 3, seed=9)
        ls = []
        for i in range(3):
            batch = {k: v[32 * i : 32 * (i + 1)] for k, v in feeds.items()}
            ls.append(model.train_batch(batch, labels[32 * i : 32 * (i + 1)]))
        losses[routing] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4, atol=2e-4)


def test_packed_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/restore with packed-layout tables: raw packed params
    round-trip, training resumes, and get_weights stays logical-shaped."""
    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.training.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    cfg, model = _small_dlrm("on")
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 32, seed=12)
    model.train_batch(feeds, labels)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, model)
    w_before = model.get_weights("table_0")["weight"]

    cfg2, model2 = _small_dlrm("on")
    model2.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                   [MetricsType.METRICS_ACCURACY])
    restore_checkpoint(path, model2)
    np.testing.assert_allclose(
        model2.get_weights("table_0")["weight"], w_before, atol=1e-6
    )
    l1 = model.train_batch(feeds, labels)
    l2 = model2.train_batch(feeds, labels)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


# ---------------------------------------------------------------- mid-band
# packed one-hot (config.onehot_packed_threshold): onehot[B, V/rpp] @
# packed[V/rpp, 128] keeps all 128 MXU lanes live, extending the one-hot
# path's profitable vocab by rpp = 128/D (reference analog:
# src/ops/embedding.cu:166-217 — one lookup+backward per table).


@pytest.mark.parametrize("d,bag,aggr_name", [
    (16, 1, "SUM"), (16, 3, "SUM"), (32, 2, "AVG"), (64, 1, "SUM"),
    (128, 2, "SUM"),
])
def test_packed_onehot_bag_matches_plain(d, bag, aggr_name):
    from dlrm_flexflow_tpu.ffconst import AggrMode
    from dlrm_flexflow_tpu.ops.embedding import (
        embedding_bag, packed_embedding_bag_onehot,
    )

    aggr = getattr(AggrMode, f"AGGR_MODE_{aggr_name}")
    rng = np.random.RandomState(7)
    v, b = 1000, 64
    table = rng.randn(v, d).astype(np.float32)
    idx = rng.randint(0, v, (b, bag)).astype(np.int32)
    idx[5, 0] = -1  # padding lookups one-hot to zero
    idx[9, :] = -1
    ref = embedding_bag(jnp.asarray(table), jnp.asarray(idx), aggr)
    packed = pu.pack_table(jnp.asarray(table), chunk_packs=16)
    got = packed_embedding_bag_onehot(
        packed, jnp.asarray(idx), aggr, d, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_onehot_packed_midband_training_matches_baseline():
    """Tables in (onehot_threshold, onehot_packed_threshold] ride the
    packed one-hot matmul with dense grads; the loss trajectory must match
    the gather+sparse-update baseline exactly (one-hot row select is
    exact) and weight IO must stay logical-shaped."""
    from dlrm_flexflow_tpu import FFConfig, LossType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[500, 12000, 40000, 9000],
        embedding_bag_size=1,
        mlp_bot=[13, 64, 16],
        mlp_top=[(4 + 1) * 16, 64, 1],
        arch_interaction_op="cat",
        batch_size=64,
    )
    feeds, labels = random_batches(cfg, 64, seed=0)
    losses = {}
    for name, pthr in (("base", 0), ("midband", 16384)):
        ffc = FFConfig(batch_size=64, compute_dtype="float32")
        ffc.onehot_packed_threshold = pthr
        ffc.packed_tables = "off"
        m = make_dlrm_model(cfg, ffc)
        m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY, [])
        flags = {
            op.name: getattr(op, "onehot_packed", False)
            for op in m.graph.compute_ops
            if hasattr(op, "num_entries")
        }
        if name == "midband":
            # 12000 and 9000 sit in (8192, 16384]; 500 stays narrow
            # one-hot; 40000 stays on the sparse path
            assert flags == {"table_0": False, "table_1": True,
                             "table_2": False, "table_3": True}, flags
            assert "table_1" not in m._sparse_names
            # weight IO returns logical [V, D] shapes for packed tables
            assert m.get_weights("table_1")["weight"].shape == (12000, 16)
        else:
            assert not any(flags.values())
        losses[name] = [float(m.train_batch(feeds, labels)) for _ in range(4)]
    np.testing.assert_allclose(
        losses["midband"], losses["base"], rtol=1e-6, atol=1e-6
    )


def test_bf16_table_training_tracks_f32():
    """config.table_dtype="bfloat16" stores packed sparse tables in bf16
    (halving the forward-gather and update-pass HBM traffic on TPU); the
    loss trajectory must track the f32-table packed path within bf16
    rounding, and weight IO / set_weights must preserve the storage dtype."""
    import jax.numpy as jnp

    from dlrm_flexflow_tpu import LossType, MetricsType, SGDOptimizer
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    losses = {}
    for td in ("float32", "bfloat16"):
        cfg, model = _small_dlrm("on")
        model.config.table_dtype = td
        model.compile(
            SGDOptimizer(lr=0.05),
            LossType.LOSS_BINARY_CROSSENTROPY,
            [MetricsType.METRICS_ACCURACY],
        )
        want = jnp.bfloat16 if td == "bfloat16" else jnp.float32
        for op in model.graph.compute_ops:
            if getattr(op, "packed", False):
                assert model._params[op.name]["weight"].dtype == want
        feeds, labels = random_batches(cfg, 32 * 4, seed=7)
        ls = []
        for i in range(4):
            batch = {k: v[32 * i: 32 * (i + 1)] for k, v in feeds.items()}
            ls.append(
                float(model.train_batch(batch, labels[32 * i: 32 * (i + 1)]))
            )
        losses[td] = ls
        if td == "bfloat16":
            # logical-shape weight IO round-trips through the bf16 storage
            w = model.get_weights("table_0")["weight"]
            assert w.shape == (500, 16) and w.dtype == np.dtype("bfloat16")
            w2 = np.random.RandomState(5).randn(500, 16).astype(np.float32)
            model.set_weights("table_0", {"weight": w2})
            got = model.get_weights("table_0")["weight"].astype(np.float32)
            np.testing.assert_allclose(got, w2, rtol=8e-3, atol=8e-3)
    np.testing.assert_allclose(
        losses["bfloat16"], losses["float32"], rtol=2e-2, atol=2e-2
    )


def test_bf16_table_adagrad_accumulators_stay_f32():
    """Row-wise AdaGrad on bf16 tables: the per-row accumulator pools keep
    f32 (bf16 accumulator adds quantize to ~8 mantissa bits and drift)."""
    import jax.numpy as jnp

    from dlrm_flexflow_tpu import LossType
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.training.optimizer import RowWiseAdagradOptimizer

    cfg, model = _small_dlrm("on")
    model.config.table_dtype = "bfloat16"
    model.compile(
        RowWiseAdagradOptimizer(lr=0.05),
        LossType.LOSS_BINARY_CROSSENTROPY, [],
    )
    packed = [op for op in model.graph.compute_ops
              if getattr(op, "packed", False)]
    assert packed
    for op in packed:
        assert model._params[op.name]["weight"].dtype == jnp.bfloat16
        assert model._opt_state["sparse"][op.name].dtype == jnp.float32
    feeds, labels = random_batches(cfg, 32 * 3, seed=8)
    ls = [
        float(model.train_batch(
            {k: v[32 * i: 32 * (i + 1)] for k, v in feeds.items()},
            labels[32 * i: 32 * (i + 1)],
        ))
        for i in range(3)
    ]
    assert ls[-1] < ls[0] + 0.05  # training stays sane on bf16 storage


# ---------------------------------------------------------------------------
# touched-chunk selective dispatch (round 5)
# ---------------------------------------------------------------------------

def _zipf_rows(rng, v, k, a=1.05):
    r = rng.zipf(a, size=4 * k)
    r = r[r <= v][:k] - 1
    assert r.shape == (k,)
    return r.astype(np.int32)


@pytest.mark.parametrize("table_dtype", ["float32", "bfloat16"])
def test_selective_sparse_chunks_parity(table_dtype):
    """A big table with a tiny, clustered batch leaves most chunks
    untouched; selective dispatch must (a) preserve untouched chunks
    bit-exactly via the aliased output and (b) match the full-grid pass on
    touched chunks — for both the direct-f32 and the bf16-accumulator
    kernel paths."""
    rng = np.random.RandomState(11)
    v, d, k, c = 200_000, 16, 64, 128  # 196 chunks, <= 64 touched
    table = rng.randn(v, d).astype(np.float32)
    packed = pu.pack_table(jnp.asarray(table), chunk_packs=c)
    if table_dtype == "bfloat16":
        packed = packed.astype(jnp.bfloat16)
    rows = _zipf_rows(rng, v, k)
    deltas = rng.randn(k, d).astype(np.float32)
    outs = {}
    for sel in (True, False):
        pu.set_selective(sel)
        try:
            outs[sel] = np.array(
                pu.packed_row_update(
                    packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
                    chunk_packs=c, interpret=True,
                    delta_dtype=jnp.float32,
                ).astype(jnp.float32)
            )
        finally:
            pu.set_selective(True)
    np.testing.assert_array_equal(outs[True], outs[False])
    expect_t = np.array(
        pu.unpack_table(packed.astype(jnp.float32), v, d)
    )
    np.add.at(expect_t, rows, deltas)
    got = np.asarray(
        pu.unpack_table(jnp.asarray(outs[True]), v, d)
    )
    tol = 1e-4 if table_dtype == "float32" else 2e-2
    np.testing.assert_allclose(got, expect_t, atol=tol, rtol=tol)
    # untouched chunks must be IDENTICAL bits, not just close
    rpp = pu.rows_per_pack(d)
    touched_chunks = set((rows // rpp) // c)
    base = np.asarray(packed.astype(jnp.float32))
    n_chunks = packed.shape[0] // c
    untouched = [i for i in range(n_chunks) if i not in touched_chunks]
    assert len(untouched) > n_chunks // 2  # the premise: most chunks idle
    for i in untouched[:: max(1, len(untouched) // 8)]:
        np.testing.assert_array_equal(
            outs[True][i * c: (i + 1) * c], base[i * c: (i + 1) * c]
        )


def test_selective_all_dropped_is_identity():
    """Every entry out of range -> zero touched chunks -> the whole grid
    parks on one untouched chunk and the table round-trips unchanged."""
    rng = np.random.RandomState(12)
    v, d, k, c = 10_000, 32, 128, 64
    packed = pu.pack_table(
        jnp.asarray(rng.randn(v, d).astype(np.float32)), chunk_packs=c
    )
    rows = np.full(k, v + 7, np.int32)  # all dropped
    got = pu.packed_row_update(
        packed, jnp.asarray(rows),
        jnp.asarray(rng.randn(k, d).astype(np.float32)), v, d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(packed))


def test_selective_lazy_adam_matches_full_grid():
    """Lazy Adam's three pool passes under selective dispatch must equal
    the full-grid result exactly on a mostly-untouched table."""
    rng = np.random.RandomState(13)
    v, d, k, c = 50_000, 16, 96, 64
    table = pu.pack_table(
        jnp.asarray(rng.randn(v, d).astype(np.float32)), chunk_packs=c
    )
    m = jnp.zeros_like(table)
    vv = jnp.zeros_like(table)
    rows = jnp.asarray(_zipf_rows(rng, v, k))
    grads = jnp.asarray(rng.randn(k, d).astype(np.float32))
    kw = dict(alpha_t=0.01, beta1=0.9, beta2=0.99, epsilon=1e-8,
              chunk_packs=c, interpret=True)
    res = {}
    for sel in (True, False):
        pu.set_selective(sel)
        try:
            res[sel] = pu.packed_lazy_adam_batched(
                [table], [m], [vv], [rows], [grads], [v], d, **kw)
        finally:
            pu.set_selective(True)
    for a, b in zip(res[True], res[False]):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_selective_host_routes_parity():
    """Host-precomputed routes (order/enc/starts) feed the same selective
    schedule: device-sort and host-route paths agree chunk-for-chunk."""
    rng = np.random.RandomState(14)
    v, d, k, c = 100_000, 16, 80, 128
    table = pu.pack_table(
        jnp.asarray(rng.randn(v, d).astype(np.float32)), chunk_packs=c
    )
    rows = _zipf_rows(rng, v, k)
    deltas = rng.randn(k, d).astype(np.float32)
    dev = pu.packed_row_update(
        table, jnp.asarray(rows), jnp.asarray(deltas), v, d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
    )
    routes = [pu.host_pack_routes(rows, v, d, c)]
    routed = pu.packed_row_update_batched(
        [table], [jnp.asarray(rows)], [jnp.asarray(deltas)], [v], d,
        chunk_packs=c, interpret=True, delta_dtype=jnp.float32,
        routes=[tuple(jnp.asarray(x) for x in routes[0])],
    )[0]
    np.testing.assert_allclose(
        np.asarray(dev), np.asarray(routed), atol=1e-5
    )


def test_manual_sparse_kernel_engages_and_matches():
    """The sparse-regime manual-DMA kernel (table in HBM, touched chunks
    DMAd in/out, untouched skipped — round 5) must engage when the entry
    count cannot touch ~40% of chunks, and match both the full-grid kernel
    and the scatter oracle bit-for-bit, across stream modes and dtypes."""
    rng = np.random.RandomState(21)
    v, d, k, c = 500_000, 16, 128, 64   # 977 chunks >> 128 entries
    n_chunks = pu.packed_num_packs(v, d, c)[1]
    assert k < 0.4 * n_chunks  # the gate's sparse condition holds
    table = rng.randn(v, d).astype(np.float32)
    rows = rng.randint(-2, v + 3, k).astype(np.int32)  # drops both sides
    deltas = rng.randn(k, d).astype(np.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        packed = pu.pack_table(jnp.asarray(table), chunk_packs=c).astype(
            dtype)
        for mode in ("expanded", "compact"):
            prev = pu.get_stream_mode()
            try:
                pu.set_stream_mode(mode)
                pu.set_selective(True)   # -> manual kernel (sparse gate)
                got_m = pu.packed_row_update(
                    packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
                    chunk_packs=c, interpret=True,
                    delta_dtype=jnp.float32)
                pu.set_selective(False)  # -> full-grid kernel
                got_f = pu.packed_row_update(
                    packed, jnp.asarray(rows), jnp.asarray(deltas), v, d,
                    chunk_packs=c, interpret=True,
                    delta_dtype=jnp.float32)
            finally:
                pu.set_selective(True)
                pu.set_stream_mode(prev)
            np.testing.assert_array_equal(
                np.array(got_m.astype(jnp.float32)),
                np.array(got_f.astype(jnp.float32)),
                err_msg=f"{dtype} {mode}",
            )
        expect = table.copy()
        keep = (rows >= 0) & (rows < v)
        np.add.at(expect, rows[keep], deltas[keep])
        got = np.array(pu.unpack_table(got_m.astype(jnp.float32), v, d))
        tol = 1e-4 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(got, expect, atol=tol, rtol=tol)


def test_manual_gate_dense_batches_keep_pipelined_kernel():
    """Entry counts that touch most chunks must NOT dispatch the manual
    kernel (its serial chunk DMA loses to the pipelined grid there)."""
    v, d, c = 100_000, 16, 64
    n_chunks = pu.packed_num_packs(v, d, c)[1]
    k = n_chunks * 4  # guaranteed-dense entry count
    # probe the gate arithmetic directly (the uniform-draw expectation)
    exp = n_chunks * (1.0 - (1.0 - 1.0 / n_chunks) ** k)
    assert exp > 0.9 * n_chunks


def test_packed_adam_checkpoint_roundtrip_and_host_routes(tmp_path):
    """Round 5: the packed Adam state is a {'m','v'} dict of separate
    pools — it must round-trip through the npz checkpoint (nested-dict
    flatten) and resume training identically; and the host-routed stream
    path must match the device-sort path under Adam (the first-occurrence
    bit-16 stream is derived identically from host routes)."""
    import jax.numpy as jnp

    from dlrm_flexflow_tpu import AdamOptimizer, LossType
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.training.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    losses = {}
    for routing in (False, True):
        cfg, model = _small_dlrm("on")
        model.config.host_routing = routing
        model.compile(AdamOptimizer(alpha=0.02),
                      LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False)
        st = model._opt_state["sparse"]["table_0"]
        assert set(st) == {"m", "v"} and st["m"].dtype == jnp.float32
        feeds, labels = random_batches(cfg, 32 * 4, seed=13)

        def step(mdl, i):
            sl = slice(32 * i, 32 * (i + 1))
            return float(mdl.train_batch(
                {k: v[sl] for k, v in feeds.items()}, labels[sl]))

        ls = [step(model, 0), step(model, 1)]
        if not routing:
            path = str(tmp_path / "ck")
            save_checkpoint(path, model)
            # fresh model resumes from the checkpointed dict state
            cfg2, model2 = _small_dlrm("on")
            model2.compile(AdamOptimizer(alpha=0.02),
                           LossType.LOSS_BINARY_CROSSENTROPY, [],
                           donate=False)
            restore_checkpoint(path, model2)
            st2 = model2._opt_state["sparse"]["table_0"]
            assert set(st2) == {"m", "v"}
            l3a, l3b = step(model, 2), step(model2, 2)
            np.testing.assert_allclose(l3a, l3b, rtol=1e-6, atol=1e-7)
            ls.append(l3a)
        else:
            ls.append(step(model, 2))
        losses[routing] = ls
    np.testing.assert_allclose(
        losses[True], losses[False], rtol=1e-5, atol=1e-6
    )
