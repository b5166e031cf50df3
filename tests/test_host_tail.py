"""Host-tail embedding offload (parallel/host_tail.py; VERDICT r2 item 9).

Beyond-HBM vocabularies as a plan axis: the device keeps a hot row prefix,
cold tail rows live in a demand-allocated host store, and a compact
capacity-capped (pos, val) exchange carries the tail partials. Reference
analog: hetero CPU embedding placement (dlrm_strategy_hetero.cc,
src/ops/embedding.cc:23-319).
"""
import numpy as np
import pytest

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.parallel.host_tail import HostTailStore


def _cfg(vocabs, bs, bag=2, dim=8):
    return DLRMConfig(
        sparse_feature_size=dim,
        embedding_size=list(vocabs),
        embedding_bag_size=bag,
        mlp_bot=[4, 16, dim],
        mlp_top=[(len(vocabs) + 1) * dim, 16, 1],
        batch_size=bs,
    )


def test_store_demand_allocation_deterministic():
    s1 = HostTailStore(8, scale=0.1, seed=7)
    s2 = HostTailStore(8, scale=0.1, seed=7)
    rows = np.asarray([5, 900_000_000_000, 5, 31])
    a = s1.lookup(rows)
    assert s1.touched_rows == 3  # duplicates share a slot
    np.testing.assert_array_equal(a[0], a[2])
    # same (seed, row) -> same init, any touch order
    b = s2.lookup(rows[::-1])
    np.testing.assert_array_equal(b[::-1], a)
    assert np.all(np.abs(a) <= 0.1) and np.std(a) > 0
    # scatter_add accumulates duplicates
    s1.scatter_add(np.asarray([5, 5]), np.ones((2, 8), np.float32))
    np.testing.assert_allclose(s1.lookup(np.asarray([5]))[0], a[0] + 2.0)
    # checkpoint round-trip
    rows_s, vals_s, acc_s = s1.state()
    s3 = HostTailStore(8, scale=0.1, seed=7)
    s3.load_state(rows_s, vals_s, acc_s)
    np.testing.assert_array_equal(s3.lookup(rows), s1.lookup(rows))


def _train_models(vocabs, hot, bs, steps, bag=2, seed=0, k_cap_frac=1.0,
                  packed="off", opt_factory=None):
    """Train a full-vocab on-device model and a host-tail model with
    IDENTICAL effective initial tables; return per-step losses + finals.
    packed="on" runs both through the packed kernel (interpret on CPU)."""
    from dlrm_flexflow_tpu.ops.embedding import Embedding

    rng = np.random.RandomState(seed)
    results = {}
    for tail in (False, True):
        cfg = _cfg(vocabs, bs, bag=bag)
        ff = FFConfig(batch_size=bs, compute_dtype="float32",
                      host_tail_threshold=hot if tail else 0,
                      host_tail_cap_frac=k_cap_frac,
                      onehot_embedding_threshold=0, fuse_embeddings=False,
                      packed_tables=packed)
        model = make_dlrm_model(cfg, ff)
        model.compile(opt_factory() if opt_factory else SGDOptimizer(lr=0.05),
                      LossType.LOSS_BINARY_CROSSENTROPY,
                      [MetricsType.METRICS_ACCURACY])
        # force identical initial tables: device rows from a shared seed,
        # host tail rows PRE-SEEDED with the same values (set_weights
        # handles the packed layout)
        embs = [op for op in model.graph.compute_ops
                if isinstance(op, Embedding)]
        for t, op in enumerate(embs):
            full = np.random.RandomState(100 + t).randn(
                vocabs[t], cfg.sparse_feature_size
            ).astype(np.float32) * 0.05
            if tail and op.host_tail_vocab:
                model.set_weights(op.name, {"weight": full[:hot]})
                store = model._host_tail.entries[op.name][0]
                tail_rows = np.arange(hot, vocabs[t])
                store.load_state(tail_rows, full[hot:])
            else:
                model.set_weights(op.name, {"weight": full})
        results[tail] = model
    feeds, labels = random_batches(_cfg(vocabs, bs, bag=bag), bs * steps,
                                   seed=3)
    losses = {}
    for tail, model in results.items():
        ls = []
        for i in range(steps):
            b = {k: v[bs * i: bs * (i + 1)] for k, v in feeds.items()}
            ls.append(float(model.train_batch(b, labels[bs * i: bs * (i + 1)])))
        losses[tail] = ls
    return results, losses


def test_host_tail_matches_full_device_model():
    """With identical initial tables and ample capacity, the host-tail
    model's loss trajectory and final tables must match the full on-device
    model exactly (the partition is semantically invisible)."""
    vocabs = [50, 200, 120]
    hot = 40  # tables with vocab > 40 get tails
    models, losses = _train_models(vocabs, hot, bs=16, steps=5)
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)
    assert models[True].host_tail_dropped == 0
    # final tables: device prefix must match; spot-check updated tail rows
    from dlrm_flexflow_tpu.ops.embedding import Embedding

    pa = models[False].get_parameters()
    pb = models[True].get_parameters()
    embs_a = [op for op in models[False].graph.compute_ops
              if isinstance(op, Embedding)]
    embs_b = [op for op in models[True].graph.compute_ops
              if isinstance(op, Embedding)]
    for op_a, op_b in zip(embs_a, embs_b):
        wa = np.asarray(pa[op_a.name]["weight"])
        wb = np.asarray(pb[op_b.name]["weight"])
        np.testing.assert_allclose(wa[: wb.shape[0]], wb,
                                   rtol=1e-5, atol=1e-6)
        if op_b.host_tail_vocab:
            store = models[True]._host_tail.entries[op_b.name][0]
            rows = np.arange(hot, op_b.host_tail_vocab)
            np.testing.assert_allclose(
                store.lookup(rows), wa[hot:], rtol=1e-5, atol=1e-6
            )


def test_host_tail_capacity_overflow_counted():
    """K_cap overflow drops the excess partials for that step, counted,
    and training still proceeds (finite loss)."""
    vocabs = [64, 1000]
    models, losses = _train_models(
        vocabs, hot=8, bs=16, steps=3, k_cap_frac=0.25
    )  # k_cap = 8 < expected ~30 misses/step on uniform data
    m = models[True]
    assert m.host_tail_dropped > 0
    assert 0.0 < m.host_tail_drop_fraction() < 1.0
    assert all(np.isfinite(losses[True]))


def test_host_tail_composes_with_8device_mesh():
    """The host-tail exchange rides the sharded train step: same hot/tail
    partition on the 8-device mesh (DP batch + table-parallel plan) must
    reproduce the single-device host-tail trajectory (reference analog: a
    hetero strategy is just another strategy file entry,
    dlrm_strategy_hetero.cc)."""
    from dlrm_flexflow_tpu.ops.embedding import Embedding
    from dlrm_flexflow_tpu.parallel.mesh import make_mesh
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

    vocabs = [50, 200, 120]
    hot, bs, steps = 40, 16, 5
    models = {}
    for use_mesh in (False, True):
        cfg = _cfg(vocabs, bs)
        ff = FFConfig(batch_size=bs, compute_dtype="float32",
                      host_tail_threshold=hot, host_tail_cap_frac=1.0,
                      onehot_embedding_threshold=0, fuse_embeddings=False)
        model = make_dlrm_model(cfg, ff)
        kw = (dict(mesh=make_mesh(), plan=dlrm_hybrid_plan())
              if use_mesh else {})
        model.compile(SGDOptimizer(lr=0.05),
                      LossType.LOSS_BINARY_CROSSENTROPY,
                      [MetricsType.METRICS_ACCURACY], **kw)
        params = model.get_parameters()
        embs = [op for op in model.graph.compute_ops
                if isinstance(op, Embedding)]
        for t, op in enumerate(embs):
            full = np.random.RandomState(100 + t).randn(
                vocabs[t], cfg.sparse_feature_size
            ).astype(np.float32) * 0.05
            params[op.name]["weight"] = full[: op.num_entries]
            if op.host_tail_vocab:
                store = model._host_tail.entries[op.name][0]
                store.load_state(np.arange(hot, vocabs[t]), full[hot:])
        model.set_parameters(params)
        models[use_mesh] = model
    feeds, labels = random_batches(_cfg(vocabs, bs), bs * steps, seed=3)
    losses = {}
    for use_mesh, model in models.items():
        losses[use_mesh] = [
            float(model.train_batch(
                {k: v[bs * i: bs * (i + 1)] for k, v in feeds.items()},
                labels[bs * i: bs * (i + 1)],
            ))
            for i in range(steps)
        ]
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)
    assert models[True].host_tail_dropped == 0


def test_zipf_indices_skew():
    """Zipf(1.05) synthetic indices (data/synthetic.zipf_indices): skewed
    toward low ranks, in range, and the hot prefix absorbs most lookups
    (what the host-tail and routed-capacity paths assume of
    frequency-ordered Criteo ids)."""
    from dlrm_flexflow_tpu.data.synthetic import zipf_indices

    rng = np.random.default_rng(0)
    v = 1_000_000
    idx = zipf_indices(rng, v, (200_000,), 1.05)
    assert idx.min() >= 0 and idx.max() < v
    assert np.mean(idx) < v / 8  # far below the uniform mean v/2
    hot_frac = np.mean(idx < (1 << 16))
    assert hot_frac > 0.7, hot_frac


def test_host_tail_plan_axis_round_trip(tmp_path):
    """host_tail_rows rides the strategy file (reference: strategy
    export/import, strategy.cc:95-189)."""
    from dlrm_flexflow_tpu.parallel.plan import ShardingPlan

    p = ShardingPlan(host_tail_rows=[0, 2048, 0, 1024])
    f = str(tmp_path / "strategy.json")
    p.save(f)
    assert ShardingPlan.load(f).host_tail_rows == [0, 2048, 0, 1024]


def test_search_offloads_beyond_hbm_table():
    """The joint annealer's host-tail axis (ffsim mode 2): a table far
    beyond per-chip HBM even at max split should be offloaded — cheaper
    than the capacity penalty (reference analog: hetero strategies choose
    CPU embedding placement, dlrm_strategy_hetero.cc)."""
    from dlrm_flexflow_tpu.autotune.machine import MachineSpec
    from dlrm_flexflow_tpu.autotune.search import (
        autotune_plan_joint, zipf_tail_fraction,
    )

    # Zipf tail mass sanity: bigger hot prefix -> smaller tail
    assert zipf_tail_fraction(227_000_000, 1 << 20) < 0.25
    assert zipf_tail_fraction(10**6, 10**5) < zipf_tail_fraction(10**6, 10**4)

    cfg = _cfg([200_000_000, 300, 50], bs=4096, bag=1, dim=16)
    ff = FFConfig(batch_size=4096, compute_dtype="float32",
                  onehot_embedding_threshold=0)
    model = make_dlrm_model(cfg, ff)
    machine = MachineSpec(num_chips=8, chips_per_host=8,
                          hbm_capacity_gb=0.05)  # 12.8 GB table, 50 MB HBM
    owner, cost, report = autotune_plan_joint(
        model.graph, machine, 4096, budget=4000, seed=0,
        host_tail_hot=1 << 20,
    )
    tails = report["host_tail_rows"]
    assert tails[0] == 1 << 20 and tails[1] == 0 and tails[2] == 0, report
    # forced fully-on-device plan must be worse (pays the capacity penalty)
    forced = autotune_plan_joint(
        model.graph, machine, 4096, budget=4000, seed=0, host_tail_hot=0,
    )[1]
    assert cost < forced


def test_autotune_compiles_searched_host_tail(tmp_path):
    """End-to-end: search (mode 2) -> plan.host_tail_rows -> compile pass
    -> the model trains with the table split hot/tail."""
    import dataclasses as _dc
    import json

    from dlrm_flexflow_tpu.autotune.machine import MachineSpec
    from dlrm_flexflow_tpu.parallel.mesh import make_mesh
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

    mfile = str(tmp_path / "machine.json")
    with open(mfile, "w") as f:
        json.dump(_dc.asdict(MachineSpec(num_chips=8, chips_per_host=8,
                                         hbm_capacity_gb=0.05)), f)
    bs = 64
    cfg = _cfg([50_000_000, 300, 50], bs=bs, bag=1)
    ff = FFConfig(batch_size=bs, compute_dtype="float32", search_budget=4000,
                  machine_model_file=mfile, onehot_embedding_threshold=0)
    model = make_dlrm_model(cfg, ff)
    plan = dlrm_hybrid_plan()
    plan.table_assignment = None
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [], mesh=make_mesh(), plan=plan)
    assert plan.host_tail_rows and plan.host_tail_rows[0] > 0
    assert model._host_tail is not None and len(model._host_tail.entries) == 1
    (op_name, (store, _, hot, _full, _)) = next(iter(model._host_tail.entries.items()))
    assert hot == plan.host_tail_rows[0]
    feeds, labels = random_batches(cfg, bs, seed=0)
    feeds["sparse_0"] = np.random.RandomState(1).randint(
        0, 50_000_000, (bs, 1)
    )  # touch genuinely-tail rows
    assert np.isfinite(float(model.train_batch(feeds, labels)))
    assert store.touched_rows > 0


def test_host_tail_memory_is_touched_rows_only():
    """A 100M-row table costs host memory only for touched rows."""
    vocabs = [100_000_000, 50]
    bs = 16
    cfg = _cfg(vocabs, bs, bag=1)
    ff = FFConfig(batch_size=bs, compute_dtype="float32",
                  host_tail_threshold=1000, onehot_embedding_threshold=0,
                  fuse_embeddings=False)
    model = make_dlrm_model(cfg, ff)
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [])
    rng = np.random.RandomState(0)
    feeds = {
        "dense_features": rng.rand(bs, 4).astype(np.float32),
        "sparse_0": rng.randint(0, 100_000_000, (bs, 1)),
        "sparse_1": rng.randint(0, 50, (bs, 1)),
    }
    labels = rng.randint(0, 2, (bs, 1)).astype(np.float32)
    loss = float(model.train_batch(feeds, labels))
    assert np.isfinite(loss)
    store = next(iter(model._host_tail.entries.values()))[0]
    assert 0 < store.touched_rows <= bs
    # eval path serves tail rows too
    ev = float(model.eval_batch(feeds, labels))
    assert np.isfinite(ev)


def test_host_tail_packed_matches_full_device_model():
    """The PACKED kernel path composes with host-tail offload (the
    flagship mlperf-full bench configuration: packed auto-enables on TPU
    at bench batch sizes): host-tail ops carry (idx, pos, val) and the
    device update must only see idx. Trajectory parity vs the packed
    full-device model, exactly like the scatter-path test."""
    vocabs = [50, 200, 120]
    hot = 40
    models, losses = _train_models(vocabs, hot, bs=16, steps=3, packed="on")
    for op in models[True].graph.compute_ops:
        if getattr(op, "host_tail_vocab", 0):
            assert getattr(op, "packed", False), "packed gate must include host-tail ops"
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-4, atol=1e-5)
    assert models[True].host_tail_dropped == 0


def test_host_tail_under_onehot_threshold_stays_on_sparse_path():
    """A hot prefix under the one-hot threshold must NOT be demoted to the
    one-hot dense-grad path (its backward only exists on the sparse path;
    compile used to crash)."""
    cfg = _cfg([50, 200, 120], 16)
    ff = FFConfig(batch_size=16, compute_dtype="float32",
                  host_tail_threshold=40, host_tail_cap_frac=1.0,
                  onehot_embedding_threshold=8192, fuse_embeddings=False)
    model = make_dlrm_model(cfg, ff)
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 16, seed=4)
    loss = model.train_batch(feeds, labels)
    assert np.isfinite(float(loss))


def test_host_tail_refuses_stateful_optimizers():
    """Host tail rows get plain -lr*g; stateful/decayed rules would make
    hot-prefix and tail rows of the SAME table follow different updates —
    compile refuses instead of silently diverging."""
    import pytest

    from dlrm_flexflow_tpu import AdamOptimizer

    cfg = _cfg([50, 200, 120], 16)
    ff = FFConfig(batch_size=16, compute_dtype="float32",
                  host_tail_threshold=40, onehot_embedding_threshold=0,
                  fuse_embeddings=False)
    model = make_dlrm_model(cfg, ff)
    with pytest.raises(AssertionError, match="plain SGD"):
        model.compile(AdamOptimizer(alpha=0.01),
                      LossType.LOSS_BINARY_CROSSENTROPY, [])
    model = make_dlrm_model(cfg, ff)
    with pytest.raises(AssertionError, match="plain SGD"):
        model.compile(SGDOptimizer(lr=0.05, weight_decay=0.01),
                      LossType.LOSS_BINARY_CROSSENTROPY, [])


def test_host_tail_eval_does_not_pollute_drop_counters():
    """eval/forward serve tail values read-only: training drop-rate
    observability and the pending-update state must be untouched, and
    eval-only ids must not allocate store rows."""
    vocabs = [50, 200, 120]
    models, _ = _train_models(vocabs, 40, bs=16, steps=2)
    m = models[True]
    total0, dropped0 = m._host_tail.total, m._host_tail.dropped
    touched0 = sum(e[0].touched_rows for e in m._host_tail.entries.values())
    feeds, labels = random_batches(_cfg(vocabs, 16), 16, seed=77)
    m.eval_batch(feeds, labels)
    m.forward(feeds)
    assert m._host_tail.total == total0
    assert m._host_tail.dropped == dropped0
    assert sum(
        e[0].touched_rows for e in m._host_tail.entries.values()
    ) == touched0


def test_host_tail_rowwise_adagrad_matches_full_device():
    """Row-wise AdaGrad host tails: the store keeps a per-row accumulator
    and applies the device's exact rule, so the hot/tail partition stays
    semantically invisible under the production Criteo optimizer."""
    from dlrm_flexflow_tpu import RowWiseAdagradOptimizer

    vocabs = [50, 200, 120]
    hot = 40
    models, losses = _train_models(
        vocabs, hot, bs=16, steps=4,
        opt_factory=lambda: RowWiseAdagradOptimizer(lr=0.05),
    )
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-4, atol=1e-5)
    assert models[True]._host_tail.rule == "rowwise_adagrad"


def test_host_tail_checkpoint_roundtrip(tmp_path):
    """Touched tail rows (+ per-row accumulator) survive checkpoint/resume
    — without this a resumed host-tail model silently re-inits every cold
    row it had trained."""
    from dlrm_flexflow_tpu import RowWiseAdagradOptimizer
    from dlrm_flexflow_tpu.training.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    vocabs = [50, 200, 120]
    hot = 40

    def build():
        cfg = _cfg(vocabs, 16)
        ff = FFConfig(batch_size=16, compute_dtype="float32",
                      host_tail_threshold=hot, host_tail_cap_frac=1.0,
                      onehot_embedding_threshold=0, fuse_embeddings=False)
        m = make_dlrm_model(cfg, ff)
        m.compile(RowWiseAdagradOptimizer(lr=0.05),
                  LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
        return m

    feeds, labels = random_batches(_cfg(vocabs, 16), 16 * 3, seed=5)
    batches = [
        ({k: v[16 * i: 16 * (i + 1)] for k, v in feeds.items()},
         labels[16 * i: 16 * (i + 1)])
        for i in range(3)
    ]
    m1 = build()
    m1.train_batch(*batches[0])
    m1.train_batch(*batches[1])
    save_checkpoint(str(tmp_path / "ck"), m1)
    l1 = float(m1.train_batch(*batches[2]))

    m2 = build()
    restore_checkpoint(str(tmp_path / "ck"), m2)
    # rerun the SAME step 3: identical loss, then identical stores
    l2 = float(m2.train_batch(*batches[2]))
    assert l1 == l2, (l1, l2)
    for name, (s1, *_rest) in m1._host_tail.entries.items():
        s2 = m2._host_tail.entries[name][0]
        r1, v1, a1 = s1.state()
        r2, v2, a2 = s2.state()
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a1, a2, rtol=1e-6, atol=1e-7)


def test_host_tail_lr_follows_distinct_sparse_optimizer():
    """With a DISTINCT sparse optimizer, the host tail rows must step at
    the SPARSE rate (the device step sets lr=None so the dense schedule
    does not leak onto the tables; the host half must match), and the
    tail/full-device trajectory equality must hold under the mixed
    optimizer setup."""
    from dlrm_flexflow_tpu import AdamOptimizer
    from dlrm_flexflow_tpu.ops.embedding import Embedding

    vocabs = [50, 200, 120]
    hot, bs, steps = 40, 16, 4
    models = {}
    for tail in (False, True):
        cfg = _cfg(vocabs, bs)
        ff = FFConfig(batch_size=bs, compute_dtype="float32",
                      host_tail_threshold=hot if tail else 0,
                      host_tail_cap_frac=1.0,
                      onehot_embedding_threshold=0, fuse_embeddings=False,
                      packed_tables="off")
        model = make_dlrm_model(cfg, ff)
        model.compile(AdamOptimizer(alpha=0.001),
                      LossType.LOSS_BINARY_CROSSENTROPY,
                      [MetricsType.METRICS_ACCURACY],
                      sparse_optimizer=SGDOptimizer(lr=0.1))
        assert model._current_lr() == pytest.approx(0.1)
        embs = [op for op in model.graph.compute_ops
                if isinstance(op, Embedding)]
        for t, op in enumerate(embs):
            full = np.random.RandomState(100 + t).randn(
                vocabs[t], cfg.sparse_feature_size
            ).astype(np.float32) * 0.05
            if tail and op.host_tail_vocab:
                model.set_weights(op.name, {"weight": full[:hot]})
                store = model._host_tail.entries[op.name][0]
                store.load_state(np.arange(hot, vocabs[t]), full[hot:])
            else:
                model.set_weights(op.name, {"weight": full})
        models[tail] = model
    feeds, labels = random_batches(_cfg(vocabs, bs), bs * steps, seed=3)
    losses = {}
    for tail, model in models.items():
        ls = []
        for i in range(steps):
            b = {k: v[bs * i: bs * (i + 1)] for k, v in feeds.items()}
            ls.append(float(model.train_batch(b, labels[bs * i: bs * (i + 1)])))
        losses[tail] = ls
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)


def test_host_tail_hot_prefix_init_uses_full_table_fan():
    """Glorot fan must come from the FULL [vocab, D] table, not the shrunk
    hot prefix — otherwise hot rows start ~sqrt(full/hot)x larger than
    tail rows and than the unoffloaded model's rows."""
    vocabs = [10_000]
    hot, dim = 64, 8
    cfg = _cfg(vocabs, 16, dim=dim)
    ff = FFConfig(batch_size=16, compute_dtype="float32",
                  host_tail_threshold=hot, onehot_embedding_threshold=0,
                  fuse_embeddings=False, packed_tables="off")
    model = make_dlrm_model(cfg, ff)
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    from dlrm_flexflow_tpu.ops.embedding import Embedding

    op = next(o for o in model.graph.compute_ops
              if isinstance(o, Embedding) and o.host_tail_vocab)
    limit = np.sqrt(6.0 / (vocabs[0] + dim))
    w = model.get_weights(op.name)["weight"]
    assert w.shape == (hot, dim)
    assert np.abs(w).max() <= limit * (1 + 1e-6), (
        "hot prefix drew from the shrunk-shape fan"
    )
    # both halves share the distribution: matching bound and a sane spread
    store = model._host_tail.entries[op.name][0]
    assert store.scale == pytest.approx(limit, rel=1e-6)
    assert np.std(w) == pytest.approx(limit / np.sqrt(3.0), rel=0.2)


def test_host_tail_drops_out_of_vocab_indices():
    """Indices >= the full vocab must NOT demand-allocate host rows (the
    dense exchange drops out-of-vocab; garbage ids would otherwise grow
    host memory without bound)."""
    vocabs = [50, 200, 120]
    hot = 40
    cfg = _cfg(vocabs, 8)
    ff = FFConfig(batch_size=8, compute_dtype="float32",
                  host_tail_threshold=hot, host_tail_cap_frac=1.0,
                  onehot_embedding_threshold=0, fuse_embeddings=False,
                  packed_tables="off")
    model = make_dlrm_model(cfg, ff)
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 8, seed=0)
    # poison EVERY sparse feed's first row with ids far past each vocab
    for name, (store, sfeed, h, full, _) in model._host_tail.entries.items():
        feeds[sfeed] = np.array(feeds[sfeed])
        feeds[sfeed][0] = full + 1000
    loss = model.train_batch(feeds, labels)
    assert np.isfinite(loss)
    for name, (store, sfeed, h, full, _) in model._host_tail.entries.items():
        touched = np.fromiter(store._slot.keys(), np.int64,
                              len(store._slot))
        assert (touched < full).all(), "out-of-vocab id allocated a tail row"
