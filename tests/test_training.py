"""Training-service tests: losses, metrics, optimizers, end-to-end convergence.

Accuracy-gate style follows the reference CI (reference:
tests/accuracy_tests.sh + keras callbacks VerifyMetrics thresholds) — a tiny
model must clear a metric threshold to pass.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu import (
    AdamOptimizer,
    FFConfig,
    LossType,
    MetricsType,
    SGDOptimizer,
)
from dlrm_flexflow_tpu.training import losses, metrics
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model, tiny_config
from dlrm_flexflow_tpu.data.synthetic import random_batches


def test_bce_loss_matches_numpy():
    p = jnp.asarray([[0.9], [0.1], [0.5]], jnp.float32)
    y = jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32)
    got = float(losses.compute_loss(LossType.LOSS_BINARY_CROSSENTROPY, p, y))
    expect = -np.mean([np.log(0.9), np.log(0.9), np.log(0.5)])
    assert abs(got - expect) < 1e-5


def test_mse_loss_grad_scale():
    """AVG_REDUCE gradient must be 2*(p-y)/batch (reference scale_factor
    semantics, include/loss_functions.h:47-49)."""
    p = jnp.asarray(np.random.rand(8, 3), jnp.float32)
    y = jnp.asarray(np.random.rand(8, 3), jnp.float32)
    g = jax.grad(
        lambda q: losses.compute_loss(LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE, q, y)
    )(p)
    np.testing.assert_allclose(np.asarray(g), 2.0 * (np.asarray(p) - np.asarray(y)) / 8, rtol=1e-5)


def test_sparse_cce_matches_dense_cce():
    probs = jax.nn.softmax(jnp.asarray(np.random.rand(6, 5), jnp.float32))
    idx = jnp.asarray([0, 3, 2, 4, 1, 1], jnp.int32)
    onehot = jax.nn.one_hot(idx, 5)
    a = losses.compute_loss(LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY, probs, idx)
    b = losses.compute_loss(LossType.LOSS_CATEGORICAL_CROSSENTROPY, probs, onehot)
    assert abs(float(a) - float(b)) < 1e-5


def test_auc_histogram_exact_on_separable():
    scores = jnp.asarray(np.concatenate([np.full(50, 0.9), np.full(50, 0.1)]), jnp.float32)[:, None]
    labels = jnp.asarray(np.concatenate([np.ones(50), np.zeros(50)]), jnp.float32)[:, None]
    m = metrics.compute_perf_metrics(MetricsType.METRICS_AUC_ROC, scores, labels, True)
    auc = metrics.auc_from_histograms(m["auc_pos_hist"], m["auc_neg_hist"])
    assert auc == pytest.approx(1.0, abs=1e-6)


def test_auc_histogram_near_sklearn_style_reference():
    rng = np.random.default_rng(0)
    n = 4000
    y = rng.integers(0, 2, n).astype(np.float32)
    s = np.clip(0.3 * y + 0.35 + 0.25 * rng.random(n), 0, 1).astype(np.float32)
    m = metrics.compute_perf_metrics(
        MetricsType.METRICS_AUC_ROC, jnp.asarray(s[:, None]), jnp.asarray(y[:, None]), True
    )
    got = metrics.auc_from_histograms(m["auc_pos_hist"], m["auc_neg_hist"])
    # exact pairwise AUC
    pos, neg = s[y == 1], s[y == 0]
    exact = (
        (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    ) / (len(pos) * len(neg))
    assert abs(got - exact) < 2e-3


def test_sgd_momentum_and_nesterov():
    params = {"w": jnp.asarray([1.0, 2.0])}
    grads = {"w": jnp.asarray([0.5, 0.5])}
    opt = SGDOptimizer(lr=0.1, momentum=0.9)
    st = opt.init(params)
    p1, st = opt.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(p1["w"]), [0.95, 1.95], rtol=1e-6)
    p2, st = opt.update(grads, st, p1)
    # v = 0.9*0.5+0.5 = 0.95
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]) - 0.1 * 0.95, rtol=1e-6)


def test_adam_step_matches_reference_formula():
    params = {"w": jnp.asarray([1.0])}
    grads = {"w": jnp.asarray([0.1])}
    opt = AdamOptimizer(alpha=0.01, beta1=0.9, beta2=0.999, epsilon=1e-8)
    st = opt.init(params)
    p1, st = opt.update(grads, st, params)
    m = 0.1 * 0.1
    v = 0.001 * 0.01
    alpha_t = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
    expect = 1.0 - alpha_t * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["w"]), [expect], rtol=1e-6)


def test_tiny_dlrm_learns_synthetic_signal():
    """End-to-end accuracy gate (reference analog: accuracy_tests.sh)."""
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[1000, 1000],
        embedding_bag_size=2,
        mlp_bot=[4, 32, 8],
        mlp_top=[24, 32, 1],
        arch_interaction_op="cat",
        batch_size=64,
    )
    ffc = FFConfig(batch_size=64, compute_dtype="float32", seed=3)
    model = make_dlrm_model(cfg, ffc)
    model.compile(
        AdamOptimizer(alpha=0.01),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY, MetricsType.METRICS_AUC_ROC],
    )
    feeds, labels = random_batches(cfg, 64 * 30, seed=7)
    model.fit(feeds, labels, epochs=10, verbose=False)
    final = model.get_metrics()
    assert final["auc"] > 0.85, final


def test_dot_interaction_dlrm_builds_and_steps():
    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[100, 100, 100],
        mlp_bot=[4, 8],
        mlp_top=[6 + 8, 8, 1],
        arch_interaction_op="dot",
        batch_size=16,
    )
    model = make_dlrm_model(cfg, FFConfig(batch_size=16, compute_dtype="float32"))
    model.compile(SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 32, seed=0)
    l0 = model.train_batch({k: v[:16] for k, v in feeds.items()}, labels[:16])
    assert np.isfinite(float(l0))


def test_training_is_deterministic_across_runs():
    """SURVEY §4 gap in the reference (no determinism tests): same seed =>
    bit-identical parameters after training. Functional JAX + explicit PRNG
    keys make this testable by construction."""
    import jax

    def run():
        cfg = tiny_config(batch_size=16)
        model = make_dlrm_model(cfg, FFConfig(batch_size=16, compute_dtype="float32", seed=7))
        model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                      [MetricsType.METRICS_ACCURACY])
        feeds, labels = random_batches(cfg, 64, seed=3)
        model.fit(feeds, labels, epochs=2, verbose=False)
        return jax.tree_util.tree_map(np.asarray, model.get_parameters())

    a, b = run(), run()
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(x, y)


def test_launcher_single_host_noop():
    from dlrm_flexflow_tpu.launch import initialize

    initialize(None, None, None)  # single host: must not raise / not distribute


def test_kaggle_arch_auc_gate():
    """Accuracy-gate pattern on the AUC north-star metric (BASELINE.md):
    a kaggle-architecture DLRM (scaled-down vocabs) must clear AUC >= 0.70
    on the learnable synthetic distribution within 6 epochs — the analog of
    the reference CI's VerifyMetrics thresholds (tests/accuracy_tests.sh)."""
    from dlrm_flexflow_tpu.training.callbacks import VerifyMetrics

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[1460, 583, 9_000, 200, 305, 24],
        embedding_bag_size=1,
        mlp_bot=[13, 64, 32, 16],
        mlp_top=[7 * 16, 64, 1],
        batch_size=128,
    )
    model = make_dlrm_model(cfg, FFConfig(batch_size=128, compute_dtype="float32", seed=0))
    model.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY, MetricsType.METRICS_AUC_ROC])
    feeds, labels = random_batches(cfg, 128 * 40, seed=9)
    hist = model.fit(feeds, labels, epochs=6, verbose=False, shuffle=True,
                     callbacks=[VerifyMetrics("auc", 0.70)])
    assert hist["auc"] >= 0.70


def test_fit_validation_data_reports_val_metrics():
    cfg = tiny_config(batch_size=16)
    model = make_dlrm_model(cfg, FFConfig(batch_size=16, compute_dtype="float32"))
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 64, seed=0)
    vfeeds, vlabels = random_batches(cfg, 32, seed=1)
    hist = model.fit(feeds, labels, epochs=1, verbose=False,
                     validation_data=(vfeeds, vlabels))
    assert "val_accuracy" in hist and 0.0 <= hist["val_accuracy"] <= 1.0
    assert "accuracy" in hist


def test_quantize_embeddings_serving():
    """Serving-side table quantization (beyond the reference): bf16 tables
    keep the forward close to f32, halve table bytes, and training refuses
    afterwards (f32 master tables required)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from dlrm_flexflow_tpu import (
        FFConfig, LossType, MetricsType, SGDOptimizer,
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[500, 300, 800],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 16],
        mlp_top=[64, 16, 1],
        batch_size=64,
    )
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=64, compute_dtype="float32",
                      onehot_embedding_threshold=0, packed_tables="on"),
    )
    model.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 64, seed=5)
    y32 = np.asarray(model.forward(feeds))
    n = model.quantize_embeddings("bfloat16")
    assert n >= 3  # one weight per table at least
    for op in model.graph.compute_ops:
        for v in model._params.get(op.name, {}).values():
            if op.op_type.name == "OP_EMBEDDING":
                assert v.dtype == jnp.bfloat16
    y16 = np.asarray(model.forward(feeds))
    np.testing.assert_allclose(y16, y32, atol=0.05)
    with pytest.raises(AssertionError, match="quantized"):
        model.train_batch(feeds, labels)


@pytest.mark.parametrize("packed", ["on", "off"])
def test_quantize_embeddings_int8(packed):
    """int8 rows + per-row scales (4x table memory): pooled outputs stay
    within quantization tolerance of f32 in both layouts."""
    import numpy as np
    import jax.numpy as jnp

    from dlrm_flexflow_tpu import (
        FFConfig, LossType, MetricsType, SGDOptimizer,
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[500, 300, 800],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 16],
        mlp_top=[64, 16, 1],
        batch_size=64,
    )
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=64, compute_dtype="float32",
                      onehot_embedding_threshold=0, packed_tables=packed),
    )
    model.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 64, seed=6)
    y32 = np.asarray(model.forward(feeds))
    n = model.quantize_embeddings("int8")
    assert n == 3
    for opn in ("table_0", "table_1", "table_2"):
        assert model._params[opn]["weight_q"].dtype == jnp.int8
        assert "weight" not in model._params[opn]
    y8 = np.asarray(model.forward(feeds))
    # int8 per-row scales: ~0.8% relative row error bound, pooled over 2
    np.testing.assert_allclose(y8, y32, atol=0.08)


def test_sparse_optimizer_mixed_adam_rowwise_adagrad():
    """compile(optimizer=Adam, sparse_optimizer=RowWiseAdagrad): the
    production DLRM pattern (beyond the reference's single-optimizer
    compile). Dense towers must follow Adam, tables must follow row-wise
    AdaGrad at the SPARSE optimizer's own rate — each checked against a
    single-optimizer run of the matching kind."""
    import numpy as np

    from dlrm_flexflow_tpu import (
        AdamOptimizer, FFConfig, LossType, RowWiseAdagradOptimizer,
        SGDOptimizer,
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[300, 200],
        embedding_bag_size=1,
        mlp_bot=[4, 16, 16],
        mlp_top=[48, 16, 1],
        batch_size=32,
    )

    def run(opt, sopt, steps=1):
        # ONE step from identical init: after that, dense-trajectory
        # divergence makes cross-optimizer comparison meaningless
        m = make_dlrm_model(
            cfg, FFConfig(batch_size=32, compute_dtype="float32", seed=7,
                          onehot_embedding_threshold=0),
        )
        m.compile(opt, LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False,
                  sparse_optimizer=sopt)
        feeds, labels = random_batches(cfg, 32 * steps, seed=9)
        for i in range(steps):
            f = {k: v[32 * i: 32 * (i + 1)] for k, v in feeds.items()}
            loss = m.train_batch(f, labels[32 * i: 32 * (i + 1)])
        assert np.isfinite(float(loss))
        return m

    mixed = run(AdamOptimizer(alpha=0.01),
                RowWiseAdagradOptimizer(lr=0.05))
    ada_only = run(RowWiseAdagradOptimizer(lr=0.05), None)
    adam_only = run(AdamOptimizer(alpha=0.01), None)

    # step-1 table update follows the sparse optimizer exactly
    np.testing.assert_allclose(
        mixed.get_weights("table_0")["weight"],
        ada_only.get_weights("table_0")["weight"], rtol=1e-5, atol=1e-6,
    )
    # ...and differs from what Adam would have done to the tables
    assert not np.allclose(
        mixed.get_weights("table_0")["weight"],
        adam_only.get_weights("table_0")["weight"], atol=1e-6,
    )
    # step-1 dense update follows Adam exactly
    np.testing.assert_allclose(
        mixed.get_weights("top_mlp_1")["kernel"],
        adam_only.get_weights("top_mlp_1")["kernel"], rtol=1e-5, atol=1e-6,
    )
    # multi-step smoke: the mixed configuration trains stably
    run(AdamOptimizer(alpha=0.01), RowWiseAdagradOptimizer(lr=0.05),
        steps=6)
    # misuse guard: sparse Adam without dense Adam refuses at compile
    m = make_dlrm_model(
        cfg, FFConfig(batch_size=32, compute_dtype="float32", seed=7,
                      onehot_embedding_threshold=0),
    )
    with pytest.raises(AssertionError, match="sparse Adam"):
        m.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [], sparse_optimizer=AdamOptimizer(alpha=0.01))


def test_predict_arbitrary_count_pads_statically():
    """FFModel.predict serves any example count: chunks at the compiled
    batch, pads the tail by repeating the last row, trims after — outputs
    equal per-row forward results, ONE compiled executable."""
    cfg = tiny_config(batch_size=32)
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=32, compute_dtype="float32", seed=5)
    )
    model.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, _ = random_batches(cfg, 77, seed=11)  # 2 full chunks + tail 13
    y = model.predict(feeds)
    assert y.shape[0] == 77
    # spot-check tail rows against a full-batch forward containing them
    full, _ = random_batches(cfg, 77, seed=11)
    ref = model.forward(
        {k: np.concatenate([v[64:77], v[:19]], axis=0) for k, v in full.items()}
    )
    np.testing.assert_allclose(y[64:77], np.asarray(ref)[:13], rtol=1e-5,
                               atol=1e-6)


def test_calibrate_step_residual_preserves_model():
    """Timing must not perturb or BREAK the live model: the multi-step
    executable donates its state buffers (compile's donate=True default),
    so a snapshot-and-restore of the live arrays would hand back DELETED
    buffers — train_batch after calibration must still work and params
    must be bit-identical to before."""
    from dlrm_flexflow_tpu.autotune.machine import preset

    cfg = tiny_config(batch_size=16)
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=16, compute_dtype="float32", seed=3)
    )
    model.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 16, seed=0)
    before = {
        op: {k: np.asarray(v) for k, v in sub.items()}
        for op, sub in model.get_parameters().items()
    }
    machine = preset("tpu_v5e").torus_for(1)
    residual, measured, pred = model.calibrate_step_residual(
        feeds, labels, steps=2, machine=machine
    )
    assert measured > 0 and pred > 0 and residual > 0
    after = model.get_parameters()  # deleted buffers would raise here
    for op, sub in before.items():
        for k, v in sub.items():
            np.testing.assert_array_equal(np.asarray(after[op][k]), v)
    l1 = model.train_batch(feeds, labels)  # and the model still trains
    assert np.isfinite(l1)


def test_quantize_embeddings_int8_fused_collection():
    """A fused EmbeddingCollection (params under 'pool') must quantize
    too — silently returning 0 while bench labels the run int8 would be
    a wrong measurement, not an error."""
    import jax.numpy as jnp

    cfg = DLRMConfig(
        sparse_feature_size=16,
        embedding_size=[500, 300, 800],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 16],
        mlp_top=[64, 16, 1],
        batch_size=64,
    )
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=64, compute_dtype="float32",
                      onehot_embedding_threshold=0, fuse_embeddings=True),
    )
    model.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    coll = next(op for op in model.graph.compute_ops
                if op.name == "embedding_collection")
    feeds, labels = random_batches(cfg, 64, seed=6)
    y32 = np.asarray(model.forward(feeds))
    n = model.quantize_embeddings("int8")
    assert n == 1
    sub = model._params[coll.name]
    assert sub["pool_q"].dtype == jnp.int8 and "pool" not in sub
    y8 = np.asarray(model.forward(feeds))
    np.testing.assert_allclose(y8, y32, atol=0.08)
    with pytest.raises(AssertionError):
        model.train_batch(feeds, labels)  # training refuses quantized
