"""Tests for the extended operator library + model zoo."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu import (
    AdamOptimizer,
    DataType,
    FFConfig,
    FFModel,
    LossType,
    MetricsType,
    PoolType,
    SGDOptimizer,
)
from dlrm_flexflow_tpu.core.graph import OpContext
from dlrm_flexflow_tpu.models import zoo


def run_graph(model, feeds, fetch=None, training=False, seq_length=-1):
    params = model.graph.init_params(jax.random.PRNGKey(0))
    ctx = OpContext(
        training=training, rng=jax.random.PRNGKey(1),
        compute_dtype=jnp.float32, seq_length=seq_length,
    )
    outs = model.graph.execute(params, feeds, ctx, fetch=fetch)
    return params, [np.asarray(o) for o in outs]


def test_batch_matmul_matches_numpy():
    m = FFModel(FFConfig(batch_size=4, compute_dtype="float32"))
    a = m.create_tensor([4, 5, 6], name="a")
    b = m.create_tensor([4, 6, 7], name="b")
    m.batch_matmul(a, b)
    rng = np.random.default_rng(0)
    av = rng.normal(size=(4, 5, 6)).astype(np.float32)
    bv = rng.normal(size=(4, 6, 7)).astype(np.float32)
    _, (y,) = run_graph(m, {"a": av, "b": bv})
    np.testing.assert_allclose(y, av @ bv, rtol=1e-4, atol=1e-5)


def test_batch_matmul_seq_length_truncation():
    """reference: FFIterationConfig.seq_length consumed by BatchMatmul
    (batch_matmul.cu:21-43) — truncated extents, zero-padded output."""
    m = FFModel(FFConfig(batch_size=2, compute_dtype="float32"))
    a = m.create_tensor([2, 4, 6], name="a")  # [B, S, D]
    b = m.create_tensor([2, 6, 4], name="b")
    m.batch_matmul(a, b, a_seq_length_dim=1, b_seq_length_dim=0)
    rng = np.random.default_rng(1)
    av = rng.normal(size=(2, 4, 6)).astype(np.float32)
    bv = rng.normal(size=(2, 6, 4)).astype(np.float32)
    _, (y,) = run_graph(m, {"a": av, "b": bv}, seq_length=3)
    expect = av[:, :3, :] @ bv[:, :, :3]
    np.testing.assert_allclose(y[:, :3, :3], expect, rtol=1e-4, atol=1e-5)
    assert np.all(y[:, 3:, :] == 0) and np.all(y[:, :, 3:] == 0)


def test_conv2d_matches_manual():
    m = FFModel(FFConfig(batch_size=1, compute_dtype="float32"))
    x = m.create_tensor([1, 1, 5, 5], name="x")
    m.conv2d(x, 1, 3, 3, 1, 1, 0, 0, use_bias=False)
    xv = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5)
    params, (y,) = run_graph(m, {"x": xv})
    k = np.asarray(params["conv2d"]["kernel"])[0, 0]
    expect = np.zeros((3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            expect[i, j] = np.sum(xv[0, 0, i : i + 3, j : j + 3] * k)
    np.testing.assert_allclose(y[0, 0], expect, rtol=1e-4, atol=1e-4)


def test_pool2d_max_and_avg():
    m = FFModel(FFConfig(batch_size=1, compute_dtype="float32"))
    x = m.create_tensor([1, 1, 4, 4], name="x")
    a = m.pool2d(x, 2, 2, 2, 2, pool_type=PoolType.POOL_MAX)
    b = m.pool2d(x, 2, 2, 2, 2, pool_type=PoolType.POOL_AVG)
    xv = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    _, (ya, yb) = run_graph(m, {"x": xv}, fetch=[a, b])
    np.testing.assert_array_equal(ya[0, 0], [[5, 7], [13, 15]])
    np.testing.assert_allclose(yb[0, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_batch_norm_normalizes():
    m = FFModel(FFConfig(batch_size=8, compute_dtype="float32"))
    x = m.create_tensor([8, 4, 3, 3], name="x")
    m.batch_norm(x, relu=False)
    xv = (np.random.default_rng(0).normal(size=(8, 4, 3, 3)) * 5 + 3).astype(np.float32)
    _, (y,) = run_graph(m, {"x": xv})
    np.testing.assert_allclose(y.mean(axis=(0, 2, 3)), np.zeros(4), atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 2, 3)), np.ones(4), atol=1e-3)


def test_attention_shape_and_softmax_rows():
    m = FFModel(FFConfig(batch_size=2, compute_dtype="float32"))
    q = m.create_tensor([2, 5, 16], name="q")
    k = m.create_tensor([2, 7, 16], name="k")
    v = m.create_tensor([2, 7, 16], name="v")
    out = m.multihead_attention(q, k, v, 16, 4)
    assert out.shape == (2, 5, 16)
    rng = np.random.default_rng(0)
    feeds = {
        "q": rng.normal(size=(2, 5, 16)).astype(np.float32),
        "k": rng.normal(size=(2, 7, 16)).astype(np.float32),
        "v": rng.normal(size=(2, 7, 16)).astype(np.float32),
    }
    _, (y,) = run_graph(m, feeds)
    assert np.isfinite(y).all()
    # attention output is a convex combination of projected values =>
    # bounded by value projection magnitudes
    assert np.abs(y).max() < 100


def test_topk_values_and_indices():
    m = FFModel(FFConfig(batch_size=3, compute_dtype="float32"))
    x = m.create_tensor([3, 6], name="x")
    vals, idx = m.top_k(x, 2)
    xv = np.asarray(
        [[1, 9, 3, 7, 5, 0], [0, 0, 1, 0, 0, 2], [6, 5, 4, 3, 2, 1]], np.float32
    )
    _, (yv, yi) = run_graph(m, {"x": xv}, fetch=[vals, idx])
    np.testing.assert_array_equal(yv, [[9, 7], [2, 1], [6, 5]])
    np.testing.assert_array_equal(yi, [[1, 3], [5, 2], [0, 1]])


def test_group_by_dispatch_and_capacity():
    from dlrm_flexflow_tpu.ops.moe import dispatch_mask, moe_capacity

    # 4 tokens, k=1, 2 experts, alpha=1 -> capacity 2
    assign = jnp.asarray([[0], [0], [0], [1]], jnp.int32)
    cap = moe_capacity(1, 2, 4, 1.0)
    assert cap == 2
    mask = np.asarray(dispatch_mask(assign, 2, cap))  # [4,1,2,2]
    # tokens 0,1 land in expert0 slots 0,1; token 2 dropped (over capacity)
    assert mask[0, 0, 0, 0] == 1 and mask[1, 0, 0, 1] == 1
    assert mask[2].sum() == 0
    assert mask[3, 0, 1, 0] == 1


def test_moe_model_trains():
    m = zoo.moe_mlp(batch_size=32, num_experts=4, k=2, in_dim=16, num_classes=4)
    m.compile(
        AdamOptimizer(alpha=0.01),
        LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32 * 8, 16)).astype(np.float32)
    w = rng.normal(size=(16, 4)).astype(np.float32)
    y = np.argmax(x @ w, axis=1).astype(np.int32)[:, None]
    losses = []
    for e in range(6):
        for i in range(8):
            sl = slice(i * 32, (i + 1) * 32)
            losses.append(float(m.train_batch({"input": x[sl]}, y[sl])))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]


def test_mnist_mlp_and_cnn_train_step():
    for build, shape in [(zoo.mnist_mlp, (16, 784)), (zoo.mnist_cnn, (16, 1, 28, 28))]:
        m = build(batch_size=16)
        m.compile(
            SGDOptimizer(lr=0.01),
            LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY,
            [MetricsType.METRICS_ACCURACY],
        )
        x = np.random.default_rng(0).normal(size=shape).astype(np.float32)
        y = np.random.default_rng(1).integers(0, 10, size=(16, 1)).astype(np.int32)
        loss = float(m.train_batch({"image": x}, y))
        assert np.isfinite(loss)


def test_transformer_trains_step():
    m = zoo.transformer(batch_size=2, seq_len=8, hidden=32, num_heads=4, num_layers=1)
    # regression head for MSE
    last = m.graph.compute_ops[-1].outputs[0]
    m.compile(SGDOptimizer(lr=0.001), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE, [])
    x = np.random.default_rng(0).normal(size=(2, 8, 32)).astype(np.float32)
    lbl = np.random.default_rng(1).normal(size=(2, 8, 32)).astype(np.float32)
    loss = float(m.train_batch({"tokens": x}, lbl.reshape(2, -1)))
    assert np.isfinite(loss)


def test_cache_and_recompile():
    from dlrm_flexflow_tpu.ops.cache import Cache, RecompileState

    m = FFModel(FFConfig(batch_size=4, compute_dtype="float32"))
    x = m.create_tensor([4, 8], name="x")
    c = m.cache(x, num_batches=4)
    m.dense(c, 1)
    m.compile(SGDOptimizer(lr=0.01), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE, [], donate=False)
    cache_op = next(op for op in m.graph.compute_ops if isinstance(op, Cache))
    xv = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    y = np.zeros((4, 1), np.float32)
    m.train_batch({"x": xv}, y)
    # identical batches -> score goes to 1
    cache_op.update_cache(xv)
    score = cache_op.update_cache(xv)
    assert score == 1.0

    def trigger(r):
        return cache_op.score >= 0.9 and not cache_op.use_cached

    def alter(r):
        cache_op.use_cached = True

    r = RecompileState(trigger, alter, m)
    assert m.recompile_on_condition(r)
    assert cache_op.use_cached and r.recompilations == 1
    # after recompile, model uses the cached tensor: feeding zeros now
    # produces same logits as feeding the cached batch
    out_cached = np.asarray(m.forward({"x": np.zeros_like(xv)}))
    out_direct = np.asarray(m.forward({"x": xv}))
    np.testing.assert_allclose(out_cached, out_direct, rtol=1e-5)
    assert not m.recompile_on_condition(r)  # trigger is once-only


def test_resnet_builds_and_forward():
    # tiny spatial size via direct bottleneck use is covered by full graph:
    # build at real 224 resolution but only check shapes + one tiny forward
    m = zoo.resnet(batch_size=1)
    out = m.graph.compute_ops[-1].outputs[0]
    assert tuple(out.shape) == (1, 10)


def test_inception_v3_builds():
    m = zoo.inception_v3(batch_size=1)
    out = m.graph.compute_ops[-1].outputs[0]
    assert tuple(out.shape) == (1, 10)


def test_candle_uno_trains_step():
    m = zoo.candle_uno(
        batch_size=8,
        dense_layers=(32, 16),
        dense_feature_layers=(16,),
        feature_shapes={"dose": 1, "cell.rnaseq": 12,
                        "drug.descriptors": 20, "drug.fingerprints": 24},
    )
    m.compile(SGDOptimizer(lr=0.01), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE,
              [MetricsType.METRICS_MEAN_SQUARED_ERROR])
    rng = np.random.RandomState(0)
    feeds = {}
    for op in m.graph.inputs:
        feeds[op.name] = rng.randn(8, op.outputs[0].shape[1]).astype(np.float32)
    labels = rng.randn(8, 1).astype(np.float32)
    loss = m.train_batch(feeds, labels)
    assert np.isfinite(float(loss))


def test_bert_proxy_forward_and_seq_truncation():
    m = zoo.bert_proxy(batch_size=2, seq_length=16, hidden=32, num_heads=4,
                       num_layers=1)
    m.compile(SGDOptimizer(lr=0.01), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE,
              [MetricsType.METRICS_MEAN_SQUARED_ERROR])
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 32).astype(np.float32)
    out = m.forward({"tokens": x})
    assert np.asarray(out).shape == (2, 16, 32)


def test_introspection_and_constant():
    """reference API parity: create_constant, get_layers, get_layer_by_name,
    print_layers (flexflow_cffi.py)."""
    m = FFModel(FFConfig(batch_size=4, compute_dtype="float32"))
    x = m.create_tensor([4, 8], name="x")
    c = m.create_constant([4, 8], 2.5, name="two_and_half")
    y = m.add(x, c, name="plus_c")
    m.dense(y, 3, name="head")
    assert [op.name for op in m.get_layers()] == ["plus_c", "head"]
    assert m.get_layer_by_name("head").out_dim == 3
    m.print_layers()
    m.compile(SGDOptimizer(lr=0.1), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE,
              [MetricsType.METRICS_MEAN_SQUARED_ERROR])
    out = np.asarray(m.forward({"x": np.zeros((4, 8), np.float32)}))
    assert out.shape == (4, 3)
    # constant actually fed: with zero x, dense input is the constant
    w = m.get_weights("head")
    expect = 2.5 * w["kernel"].sum(axis=1) + w.get("bias", 0)
    np.testing.assert_allclose(out[0], expect, rtol=1e-4, atol=1e-5)


def test_constant_in_chunked_fit_and_dtype():
    """Regression: constants must feed the scanned/chunked path and honor
    their declared dtype."""
    from dlrm_flexflow_tpu.ffconst import DataType as DT

    m = FFModel(FFConfig(batch_size=4, compute_dtype="float32"))
    x = m.create_tensor([4, 8], name="x")
    c = m.create_constant([4, 8], 1.0, name="ones")
    m.dense(m.add(x, c), 2, name="head")
    m.compile(SGDOptimizer(lr=0.1), LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE,
              [MetricsType.METRICS_MEAN_SQUARED_ERROR])
    assert m._constant_arrays["ones"].dtype == np.float32
    rng = np.random.RandomState(0)
    feeds = {"x": rng.randn(16, 8).astype(np.float32)}
    labels = rng.randn(16, 2).astype(np.float32)
    # chunked path (fit with steps_per_call > 1) previously KeyError'd
    hist = m.fit(feeds, labels, epochs=1, verbose=False, steps_per_call=2)
    assert np.isfinite(hist["mse"])
    # int constant keeps integer dtype
    m2 = FFModel(FFConfig(batch_size=4))
    ci = m2.create_constant([4, 1], 3, dtype=DT.DT_INT64, name="three")
    assert m2._constant_feeds["three"][2] is DT.DT_INT64
