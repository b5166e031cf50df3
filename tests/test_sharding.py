"""Sharded-execution tests on the fake 8-device CPU mesh.

This is the capability the reference never had in CI (SURVEY §4: multi-GPU
correctness needed 8 real GPUs) — we verify table-parallel embedding
exchange and hybrid-parallel DLRM training on a simulated slice.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dlrm_flexflow_tpu import AdamOptimizer, FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.core.graph import OpContext
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.ffconst import AggrMode
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.ops.embedding import embedding_bag
from dlrm_flexflow_tpu.parallel.embedding_collection import (
    ShardedEmbeddingLayout,
    greedy_assignment,
    round_robin_assignment,
    sharded_embedding_lookup,
)
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import ShardingPlan, dlrm_hybrid_plan
from dlrm_flexflow_tpu.core.initializers import GlorotUniform


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_greedy_assignment_balances_rows():
    vocabs = [1000, 10, 10, 10, 990, 500, 500, 10]
    owner = greedy_assignment(vocabs, 4)
    load = [0] * 4
    for v, o in zip(vocabs, owner):
        load[o] += v
    assert max(load) <= 1010  # near-perfect balance (ideal 1010 on 4 shards)


@pytest.mark.parametrize("policy", ["round_robin", "greedy"])
@pytest.mark.parametrize("aggr", [AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG])
def test_sharded_lookup_matches_per_table(mesh, policy, aggr):
    n = 8
    vocabs = [50, 1000, 30, 77, 400, 12, 260, 99, 31, 500, 8]
    d = 8
    owner = (
        round_robin_assignment(len(vocabs), n)
        if policy == "round_robin"
        else greedy_assignment(vocabs, n)
    )
    layout = ShardedEmbeddingLayout(vocabs, d, n, owner)
    pool = layout.init_params(jax.random.PRNGKey(0), GlorotUniform())
    pool = jax.device_put(pool, NamedSharding(mesh, layout.param_spec()))
    rng = np.random.default_rng(0)
    b, h = 16, 3
    idx = np.stack(
        [rng.integers(0, v, size=(b, h)) for v in vocabs], axis=1
    ).astype(np.int32)
    idx[0, 0, 1:] = -1
    idx[3, 5, :] = -1  # fully-empty bag
    idxj = jax.device_put(jnp.asarray(idx), NamedSharding(mesh, P("data", None, None)))
    out = jax.jit(
        lambda p, i: sharded_embedding_lookup(layout, p, i, mesh, aggr)
    )(pool, idxj)
    ref = np.stack(
        [
            np.asarray(embedding_bag(layout.extract_table(pool, t), jnp.asarray(idx[:, t]), aggr))
            for t in range(len(vocabs))
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_sharded_lookup_grad_matches(mesh):
    n = 8
    vocabs = [40, 200, 64, 33, 100, 8, 90, 55]
    layout = ShardedEmbeddingLayout(vocabs, 4, n, greedy_assignment(vocabs, n))
    pool = jax.device_put(
        layout.init_params(jax.random.PRNGKey(1), GlorotUniform()),
        NamedSharding(mesh, layout.param_spec()),
    )
    rng = np.random.default_rng(1)
    idx = jnp.asarray(
        np.stack([rng.integers(0, v, size=(16, 2)) for v in vocabs], axis=1), jnp.int32
    )
    idx = jax.device_put(idx, NamedSharding(mesh, P("data", None, None)))
    w = jnp.asarray(rng.normal(size=(16, len(vocabs), 4)), jnp.float32)

    g = jax.jit(
        jax.grad(lambda p: jnp.sum(sharded_embedding_lookup(layout, p, idx, mesh) * w))
    )(pool)

    def ref_loss(p):
        outs = [
            embedding_bag(layout.extract_table(p, t), idx[:, t], AggrMode.AGGR_MODE_SUM)
            for t in range(len(vocabs))
        ]
        return jnp.sum(jnp.stack(outs, axis=1) * w)

    g_ref = jax.grad(ref_loss)(pool)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def _tiny_cfg():
    return DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[300, 1000, 50, 120, 700, 90, 33, 410, 64, 256],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 8],
        mlp_top=[88, 16, 1],
        arch_interaction_op="cat",
        batch_size=64,
    )


def test_sharded_dlrm_forward_matches_unsharded(mesh):
    """The compiled hybrid-parallel DLRM must produce the same logits as
    the identical graph run without a mesh, given the same params."""
    cfg = _tiny_cfg()
    model = make_dlrm_model(cfg, FFConfig(batch_size=64, compute_dtype="float32", onehot_embedding_threshold=0))
    plan = dlrm_hybrid_plan()
    model.compile(
        SGDOptimizer(lr=0.1),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
        mesh=mesh,
        plan=plan,
    )
    # graph got rewritten: embedding ops fused into one collection
    names = [type(op).__name__ for op in model.graph.compute_ops]
    assert "EmbeddingCollection" in names
    assert "Embedding" not in names

    feeds, labels = random_batches(cfg, 64, seed=5)
    sharded_out = np.asarray(model.forward(feeds))

    params = model.get_parameters()
    ctx = OpContext(training=False, compute_dtype=jnp.float32, mesh=None, plan=None)
    final = model.graph.compute_ops[-1]
    (unsharded_out,) = model.graph.execute(params, {k: jnp.asarray(v) for k, v in feeds.items()}, ctx, fetch=final.outputs)
    np.testing.assert_allclose(sharded_out, np.asarray(unsharded_out), rtol=1e-4, atol=1e-5)


def test_sharded_dlrm_trains(mesh):
    cfg = _tiny_cfg()
    model = make_dlrm_model(cfg, FFConfig(batch_size=64, compute_dtype="float32", seed=11, onehot_embedding_threshold=0))
    model.compile(
        AdamOptimizer(alpha=0.01),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY, MetricsType.METRICS_AUC_ROC],
        mesh=mesh,
        plan=dlrm_hybrid_plan(),
    )
    feeds, labels = random_batches(cfg, 64 * 20, seed=9)
    model.fit(feeds, labels, epochs=6, verbose=False)
    final = model.get_metrics()
    assert final["auc"] > 0.8, final


def test_plan_save_load_roundtrip(tmp_path, mesh):
    plan = dlrm_hybrid_plan()
    plan.table_split = [2, 1, 4]
    plan.make_layout([100, 200, 300], 8, 8)
    from dlrm_flexflow_tpu.parallel.plan import OpShardSpec

    plan.op_specs["dense_0"] = OpShardSpec(
        output_specs=[P("data", None)], param_specs={"kernel": P(None, "data")}
    )
    path = str(tmp_path / "strategy.json")
    plan.save(path)
    loaded = ShardingPlan.load(path)
    assert loaded.table_assignment == plan.table_assignment
    assert loaded.table_split == [2, 1, 4]
    assert loaded.embedding_mode == "table_parallel"
    assert loaded.op_specs["dense_0"].output_specs == [P("data", None)]
    assert loaded.op_specs["dense_0"].param_specs == {"kernel": P(None, "data")}


def test_parameter_parallel_matches_single_device():
    """TP (reference: --enable-parameter-parallel, linear.cu:769-960 replica
    machinery): column-sharded dense kernels over a 2D (data x model) mesh
    must produce the same loss as unsharded execution."""
    from dlrm_flexflow_tpu.parallel.plan import enable_parameter_parallel

    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[64, 96, 300],
        embedding_bag_size=2,
        mlp_bot=[4, 64, 8],
        mlp_top=[32, 64, 1],
        batch_size=16,
    )

    def build(mesh, plan, epp=False):
        ffc = FFConfig(batch_size=16, compute_dtype="float32", seed=11)
        ffc.enable_parameter_parallel = epp
        m = make_dlrm_model(cfg, ffc)
        m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY], mesh=mesh, plan=plan)
        return m

    feeds, labels = random_batches(cfg, 16, seed=5)
    # reference = same table-parallel plan on a 1D mesh (identical fused
    # init); the delta isolates the parameter-parallel machinery
    mesh1 = make_mesh((8,), ("data",))
    ref = build(mesh1, dlrm_hybrid_plan())
    l_ref = [float(ref.train_batch(feeds, labels)) for _ in range(3)]

    mesh2 = make_mesh((4, 2), ("data", "model"))
    tp = build(mesh2, dlrm_hybrid_plan(), epp=True)
    assert any("model" in str(s) for s in
               (spec for e in tp.plan.op_specs.values()
                for spec in (e.param_specs or {}).values())), "TP specs missing"
    l_tp = [float(tp.train_batch(feeds, labels)) for _ in range(3)]
    np.testing.assert_allclose(l_tp, l_ref, rtol=2e-4, atol=2e-5)


def test_row_split_lookup_matches_unsplit(mesh):
    """Row-range splitting of hot tables (PERF.md scaling fix): lookups must
    match the unsplit table-parallel result exactly."""
    from dlrm_flexflow_tpu.parallel.embedding_collection import expand_subtables
    from dlrm_flexflow_tpu.parallel.plan import greedy_subtable_assignment

    rng = np.random.RandomState(0)
    vocabs = [200, 64, 500]
    split = [4, 1, 8]
    d, b, h, n = 8, 16, 3, 8
    init = GlorotUniform()
    key = jax.random.PRNGKey(0)

    base = ShardedEmbeddingLayout(
        vocabs, d, n, greedy_assignment(vocabs, n)
    )
    subs = expand_subtables(vocabs, split)
    lay = ShardedEmbeddingLayout(
        vocabs, d, n,
        greedy_subtable_assignment(subs, [l for (_, _, l) in subs], n),
        split=split,
    )
    pool_base = base.init_params(key, init)
    pool_split = lay.init_params(key, init)
    # identical logical tables regardless of split
    for t in range(3):
        np.testing.assert_array_equal(
            np.asarray(base.extract_table(pool_base, t)),
            np.asarray(lay.extract_table(pool_split, t)),
        )

    idx = np.stack(
        [rng.randint(0, v, size=(b, h)) for v in vocabs], axis=1
    ).astype(np.int32)
    idx[0, 0, 1:] = -1
    idx = jnp.asarray(idx)
    out_base = sharded_embedding_lookup(base, pool_base, idx, mesh)
    out_split = sharded_embedding_lookup(lay, pool_split, idx, mesh)
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_base), rtol=1e-5, atol=1e-6
    )


def test_row_split_sparse_update_matches_unsplit(mesh):
    from dlrm_flexflow_tpu.parallel.embedding_collection import (
        expand_subtables,
        sharded_embedding_sparse_update,
    )
    from dlrm_flexflow_tpu.parallel.plan import greedy_subtable_assignment

    rng = np.random.RandomState(1)
    vocabs = [300, 120]
    split = [8, 2]
    d, b, h, n = 4, 16, 2, 8
    init = GlorotUniform()
    key = jax.random.PRNGKey(2)
    base = ShardedEmbeddingLayout(vocabs, d, n, greedy_assignment(vocabs, n))
    subs = expand_subtables(vocabs, split)
    lay = ShardedEmbeddingLayout(
        vocabs, d, n,
        greedy_subtable_assignment(subs, [l for (_, _, l) in subs], n),
        split=split,
    )
    pool_base = base.init_params(key, init)
    pool_split = lay.init_params(key, init)
    idx = jnp.asarray(np.stack(
        [rng.randint(0, v, size=(b, h)) for v in vocabs], axis=1
    ).astype(np.int32))
    g = jnp.asarray(rng.randn(b, 2, d).astype(np.float32))
    opt = SGDOptimizer(lr=0.1)
    new_base, _ = sharded_embedding_sparse_update(
        base, pool_base, None, idx, g, mesh, opt
    )
    new_split, _ = sharded_embedding_sparse_update(
        lay, pool_split, None, idx, g, mesh, opt
    )
    for t in range(2):
        np.testing.assert_allclose(
            np.asarray(lay.extract_table(new_split, t)),
            np.asarray(base.extract_table(new_base, t)),
            rtol=1e-5, atol=1e-6,
        )


def test_row_split_dlrm_trains_end_to_end(mesh):
    from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[400, 64, 900],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 8],
        mlp_top=[32, 16, 1],
        batch_size=16,
    )
    plan = dlrm_hybrid_plan()
    plan.table_split = [4, 1, 8]
    ffc = FFConfig(batch_size=16, compute_dtype="float32", seed=3,
                   onehot_embedding_threshold=0)
    m = make_dlrm_model(cfg, ffc)
    m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
              [MetricsType.METRICS_ACCURACY], mesh=mesh, plan=plan)
    feeds, labels = random_batches(cfg, 64, seed=4)
    hist = m.fit(feeds, labels, epochs=2, verbose=False)
    assert np.isfinite(hist.get("accuracy", 0.5))
    losses = [float(m.train_batch({k: v[:16] for k, v in feeds.items()}, labels[:16]))
              for _ in range(3)]
    assert losses[-1] < losses[0] + 1e-3  # moving in a sane direction


def test_mixed_fusion_keeps_small_tables_replicated(mesh):
    """Tables at or under the one-hot threshold stay as individual replicated
    ops in the sharded plan (DP one-hot lookup + psum dense grads), only big
    tables join the all-to-all collection (PERF.md measured routing)."""
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[50_000, 30_000, 100, 40],
        embedding_bag_size=1,
        mlp_bot=[4, 16, 8],
        mlp_top=[40, 16, 1],
        batch_size=16,
    )
    ffc = FFConfig(batch_size=16, compute_dtype="float32",
                   onehot_embedding_threshold=8192)
    m = make_dlrm_model(cfg, ffc)
    m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
              [MetricsType.METRICS_ACCURACY], mesh=mesh,
              plan=dlrm_hybrid_plan())
    names = [type(op).__name__ for op in m.graph.compute_ops]
    assert names.count("EmbeddingCollection") == 1
    assert names.count("Embedding") == 2  # the vocab-100/-40 tables
    feeds, labels = random_batches(cfg, 32, seed=7)
    hist = m.fit(feeds, labels, epochs=2, verbose=False)
    assert np.isfinite(hist["accuracy"])


def test_sharded_checkpoint_roundtrip(tmp_path, mesh):
    """Checkpointing a mesh-sharded model must gather shards to host and
    restore them re-sharded with identical values and continued training."""
    from dlrm_flexflow_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    cfg = _tiny_cfg()
    def build():
        m = make_dlrm_model(cfg, FFConfig(batch_size=64, compute_dtype="float32",
                                          seed=5, onehot_embedding_threshold=0))
        m.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY], mesh=mesh,
                  plan=dlrm_hybrid_plan())
        return m

    m1 = build()
    feeds, labels = random_batches(cfg, 64, seed=6)
    m1.train_batch(feeds, labels)
    save_checkpoint(str(tmp_path / "ck"), m1)

    m2 = build()
    restore_checkpoint(str(tmp_path / "ck"), m2)
    l1 = float(m1.train_batch(feeds, labels))
    l2 = float(m2.train_batch(feeds, labels))
    np.testing.assert_allclose(l2, l1, rtol=1e-5, atol=1e-6)


def test_expert_parallel_ffn_matches_reference(mesh):
    """EP MoE (§2.7): expert-sharded FFNs with all-to-all dispatch must match
    the unsharded oracle (same capacity/drop semantics) in forward AND in
    expert-weight gradients."""
    from dlrm_flexflow_tpu.parallel.expert_parallel import (
        expert_parallel_ffn,
        moe_gate,
        reference_moe_ffn,
    )
    from jax.sharding import NamedSharding

    rng = np.random.RandomState(0)
    B, D, H, E, K = 64, 8, 16, 8, 2
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    gate_w = jnp.asarray(rng.randn(D, E).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(E, D, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(E, H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(E, H, D).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(E, D).astype(np.float32) * 0.1)

    gv, assign = moe_gate(x, gate_w, K)

    def sharded(x, w1, b1, w2, b2):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        return expert_parallel_ffn(xs, gv, assign, w1, b1, w2, b2, mesh)

    out_ep = np.asarray(sharded(x, w1, b1, w2, b2))
    out_ref = np.asarray(
        reference_moe_ffn(x, gv, assign, w1, b1, w2, b2, shards=8)
    )
    np.testing.assert_allclose(out_ep, out_ref, rtol=1e-4, atol=1e-5)

    g_ep = jax.grad(lambda w1: jnp.sum(sharded(x, w1, b1, w2, b2) ** 2))(w1)
    g_ref = jax.grad(
        lambda w1: jnp.sum(reference_moe_ffn(x, gv, assign, w1, b1, w2, b2, shards=8) ** 2)
    )(w1)
    np.testing.assert_allclose(np.asarray(g_ep), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_exchange_property_random_configs(mesh, seed):
    """Property test: for random (vocabs, splits, assignment, bag sizes,
    padding patterns), the sharded fused lookup must equal the per-table
    replicated oracle exactly."""
    from dlrm_flexflow_tpu.parallel.embedding_collection import (
        expand_subtables,
        replicated_embedding_lookup,
    )
    from dlrm_flexflow_tpu.parallel.plan import greedy_subtable_assignment

    rng = np.random.RandomState(seed)
    n = 8
    num_t = rng.randint(2, 7)
    vocabs = [int(rng.randint(9, 800)) for _ in range(num_t)]
    split = [int(rng.choice([1, 1, 2, 4, 8])) for _ in range(num_t)]
    d = int(rng.choice([4, 8, 16]))
    b = 16
    h = int(rng.randint(1, 5))
    subs = expand_subtables(vocabs, split)
    owner = greedy_subtable_assignment(subs, [l for (_, _, l) in subs], n)
    lay = ShardedEmbeddingLayout(vocabs, d, n, owner, split=split)
    key = jax.random.PRNGKey(seed)
    pool = lay.init_params(key, GlorotUniform())
    tables = [lay.extract_table(pool, t) for t in range(num_t)]

    idx = np.stack(
        [rng.randint(0, v, size=(b, h)) for v in vocabs], axis=1
    ).astype(np.int32)
    # random padding
    pad_mask = rng.random((b, num_t, h)) < 0.2
    idx[pad_mask] = -1
    idx = jnp.asarray(idx)

    got = sharded_embedding_lookup(lay, pool, idx, mesh)
    ref = replicated_embedding_lookup(tables, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# hierarchical (ICI-combine-then-DCN) pooled exchange
# --------------------------------------------------------------------------

def _hier_layout_pair(cph, vocabs, split, d=8, n=8):
    """(flat layout, hierarchical layout) over the SAME sub-table owners."""
    from dlrm_flexflow_tpu.parallel.embedding_collection import expand_subtables
    from dlrm_flexflow_tpu.parallel.plan import hierarchical_subtable_assignment

    subs = expand_subtables(vocabs, split)
    owner = hierarchical_subtable_assignment(
        subs, [l for (_, _, l) in subs], n, cph
    )
    flat = ShardedEmbeddingLayout(vocabs, d, n, list(owner), split=list(split))
    hier = ShardedEmbeddingLayout(
        vocabs, d, n, list(owner), split=list(split), chips_per_host=cph
    )
    assert hier.hierarchical
    return flat, hier


@pytest.mark.parametrize("cph", [2, 4])
def test_hierarchical_lookup_matches_flat(mesh, cph):
    """Two-stage exchange must be numerically identical to the flat
    all-to-all — and carry fewer bytes over the host boundary."""
    from dlrm_flexflow_tpu.parallel.embedding_collection import (
        sharded_embedding_sparse_update,
    )

    n, d = 8, 8
    vocabs = [50, 1000, 30, 77, 400, 12, 260, 99, 31, 500, 8]
    split = [1, 4, 1, 2, 2, 1, 1, 1, 1, 4, 1]
    flat, hier = _hier_layout_pair(cph, vocabs, split, d, n)
    pool = flat.init_params(jax.random.PRNGKey(0), GlorotUniform())
    poolf = jax.device_put(pool, NamedSharding(mesh, flat.param_spec()))
    poolh = jax.device_put(pool, NamedSharding(mesh, hier.param_spec()))
    rng = np.random.default_rng(0)
    b, h = 16, 3
    idx = np.stack(
        [rng.integers(0, v, size=(b, h)) for v in vocabs], axis=1
    ).astype(np.int32)
    idx[0, 0, 1:] = -1
    idx[3, 5, :] = -1
    idxj = jax.device_put(
        jnp.asarray(idx), NamedSharding(mesh, P("data", None, None))
    )
    out_f = jax.jit(lambda p, i: sharded_embedding_lookup(flat, p, i, mesh))(poolf, idxj)
    out_h = jax.jit(lambda p, i: sharded_embedding_lookup(hier, p, i, mesh))(poolh, idxj)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_f), rtol=1e-5, atol=1e-6)
    assert hier.dcn_pooled_exchange_bytes(4096) < flat.dcn_pooled_exchange_bytes(4096)

    # fused sparse-update parity (backward exchange mirror)
    g = jax.device_put(
        jnp.asarray(rng.normal(size=(b, len(vocabs), d)), jnp.float32),
        NamedSharding(mesh, P("data", None, None)),
    )
    opt = SGDOptimizer(lr=0.1)
    nf, _ = jax.jit(
        lambda p, i, gg: sharded_embedding_sparse_update(flat, p, None, i, gg, mesh, opt)
    )(poolf, idxj, g)
    nh, _ = jax.jit(
        lambda p, i, gg: sharded_embedding_sparse_update(hier, p, None, i, gg, mesh, opt)
    )(poolh, idxj, g)
    np.testing.assert_allclose(np.asarray(nh), np.asarray(nf), rtol=1e-5, atol=1e-6)

    # autodiff through the two-stage forward (dense-grad path)
    w = jnp.asarray(rng.normal(size=(b, len(vocabs), d)), jnp.float32)
    gh = jax.jit(
        jax.grad(lambda p: jnp.sum(sharded_embedding_lookup(hier, p, idxj, mesh) * w))
    )(poolh)
    gf = jax.jit(
        jax.grad(lambda p: jnp.sum(sharded_embedding_lookup(flat, p, idxj, mesh) * w))
    )(poolf)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gf), rtol=1e-4, atol=1e-5)


def test_hierarchical_assignment_colocates_splits():
    """A split table's sub-tables land on distinct chips of ONE host (that is
    what lets the combine ride ICI); split > chips_per_host spans hosts in
    full-host chunks."""
    from dlrm_flexflow_tpu.parallel.embedding_collection import expand_subtables
    from dlrm_flexflow_tpu.parallel.plan import hierarchical_subtable_assignment

    vocabs = [4000, 100, 2000, 300, 8000]
    split = [4, 1, 2, 1, 8]  # table 4 spans 2 hosts (8 > cph=4)
    subs = expand_subtables(vocabs, split)
    owner = hierarchical_subtable_assignment(
        subs, [l for (_, _, l) in subs], 8, 4
    )
    by_table = {}
    for i, (t, _, _) in enumerate(subs):
        by_table.setdefault(t, []).append(owner[i])
    for t, shards in by_table.items():
        assert len(set(shards)) == len(shards), f"table {t} reuses a chip"
        hosts = {s // 4 for s in shards}
        expected_hosts = -(-len(shards) // 4)
        assert len(hosts) == expected_hosts, f"table {t} spread over {hosts}"


def test_hierarchical_dlrm_trains_and_plan_roundtrips(mesh, tmp_path):
    """Full DLRM train step through the hierarchical exchange + strategy-file
    round trip of the chips_per_host field."""
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[400, 64, 900],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 8],
        mlp_top=[32, 16, 1],
        batch_size=16,
    )
    plan = dlrm_hybrid_plan()
    plan.table_split = [2, 1, 4]
    plan.chips_per_host = 4
    ffc = FFConfig(batch_size=16, compute_dtype="float32", seed=3,
                   onehot_embedding_threshold=0)
    m = make_dlrm_model(cfg, ffc)
    m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
              [MetricsType.METRICS_ACCURACY], mesh=mesh, plan=plan)
    assert m._embedding_layout is not None and m._embedding_layout.hierarchical
    feeds, labels = random_batches(cfg, 64, seed=4)
    hist = m.fit(feeds, labels, epochs=2, verbose=False)
    assert np.isfinite(hist.get("accuracy", 0.5))
    losses = [float(m.train_batch({k: v[:16] for k, v in feeds.items()}, labels[:16]))
              for _ in range(3)]
    assert losses[-1] < losses[0] + 1e-3

    p = str(tmp_path / "strategy.json")
    plan.save(p)
    loaded = ShardingPlan.load(p)
    assert loaded.chips_per_host == 4
    assert loaded.table_split == [2, 1, 4]


def test_hierarchical_degenerate_falls_back_flat():
    """chips_per_host covering the whole mesh (single host) or not dividing
    it must quietly mean the flat exchange."""
    vocabs = [100, 200]
    for cph in [8, 3, 1]:
        lay = ShardedEmbeddingLayout(
            vocabs, 4, 8, [0, 1], chips_per_host=cph
        )
        assert not lay.hierarchical


def test_sharded_mixed_sparse_optimizer_trains(mesh):
    """compile(optimizer=Adam, sparse_optimizer=RowWiseAdagrad) on the
    8-device mesh: the collection's row updates follow the sparse
    optimizer while dense towers ride Adam — one epoch must train with
    finite loss and the collection state must be the AdaGrad accumulator
    (not Adam m/v)."""
    from dlrm_flexflow_tpu import RowWiseAdagradOptimizer

    cfg = _tiny_cfg()
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=64, compute_dtype="float32", seed=11,
                      onehot_embedding_threshold=0),
    )
    model.compile(
        AdamOptimizer(alpha=0.01),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
        mesh=mesh,
        plan=dlrm_hybrid_plan(),
        sparse_optimizer=RowWiseAdagradOptimizer(lr=0.05),
    )
    feeds, labels = random_batches(cfg, 64 * 4, seed=9)
    model.fit(feeds, labels, epochs=1, verbose=False)
    st = model._opt_state["sparse"]["embedding_collection"]
    # row-wise AdaGrad accumulator: one state pool shaped like the params
    # pool's rows (Adam would carry a stacked [2, ...] m/v state)
    assert st is not None and st.shape[0] != 2


@pytest.mark.parametrize("exchange,opt", [
    ("dense", "sgd"), ("routed", "sgd"), ("dense", "adam"),
    ("dense", "rwa"),
])
def test_sharded_bf16_table_training_tracks_f32(mesh, exchange, opt):
    """Round 5: config.table_dtype="bfloat16" extends to the SHARDED
    collection — the packed pool stores bf16 (halving the local gather and
    table-pass HBM on every chip), the local row update still accumulates
    f32 through the packed kernel, optimizer side pools stay f32, and both
    exchange modes ride it. Loss must track the f32-pool trajectory within
    bf16 rounding (the single-chip analog:
    test_packed_update.test_bf16_table_training_tracks_f32)."""
    from dlrm_flexflow_tpu.ops.embedding_collection_op import (
        EmbeddingCollection,
    )

    losses = {}
    for td in ("float32", "bfloat16"):
        cfg = _tiny_cfg()
        model = make_dlrm_model(
            cfg,
            FFConfig(
                batch_size=64, compute_dtype="float32", seed=11,
                onehot_embedding_threshold=0, packed_tables="on",
                exchange=exchange,
            ),
        )
        model.config.table_dtype = td
        if opt == "rwa":
            from dlrm_flexflow_tpu.training.optimizer import (
                RowWiseAdagradOptimizer,
            )

            optimizer = RowWiseAdagradOptimizer(lr=0.05)
        else:
            optimizer = (
                SGDOptimizer(lr=0.05) if opt == "sgd"
                else AdamOptimizer(alpha=0.01)
            )
        model.compile(
            optimizer, LossType.LOSS_BINARY_CROSSENTROPY, [],
            mesh=mesh, plan=dlrm_hybrid_plan(),
        )
        colls = [
            op for op in model.graph.compute_ops
            if type(op) is EmbeddingCollection
        ]
        assert colls and colls[0].layout.packed_pool
        want = jnp.bfloat16 if td == "bfloat16" else jnp.float32
        assert model._params[colls[0].name]["pool"].dtype == want
        st = model._opt_state["sparse"].get(colls[0].name)
        if st is not None:  # Adam m/v side pools stay f32 (dict of pools)
            for leaf in jax.tree_util.tree_leaves(st):
                assert leaf.dtype == jnp.float32
        feeds, labels = random_batches(cfg, 64 * 4, seed=7)
        ls = [
            float(model.train_batch(
                {k: v[64 * i: 64 * (i + 1)] for k, v in feeds.items()},
                labels[64 * i: 64 * (i + 1)],
            ))
            for i in range(4)
        ]
        losses[td] = ls
    np.testing.assert_allclose(
        losses["bfloat16"], losses["float32"], rtol=2e-2, atol=2e-2
    )
