"""Op-level numerical parity tests vs numpy references.

Mirrors the reference's op-test strategy (reference: tests/ops/test_harness.py
— generate inputs, compute numpy/torch reference, assert allclose) but runs
in-process against the graph executor instead of shelling out to standalone
binaries.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu import (
    AggrMode,
    DataType,
    FFConfig,
    FFModel,
)
from dlrm_flexflow_tpu.core.graph import OpContext


def run_graph(model, feeds, fetch=None, training=False):
    params = model.graph.init_params(jax.random.PRNGKey(0))
    ctx = OpContext(training=training, rng=jax.random.PRNGKey(1), compute_dtype=jnp.float32)
    outs = model.graph.execute(params, feeds, ctx, fetch=fetch)
    return params, [np.asarray(o) for o in outs]


def make_model():
    return FFModel(FFConfig(batch_size=8, compute_dtype="float32"))


def test_dense_matches_numpy():
    m = make_model()
    x = m.create_tensor([8, 32], name="x")
    m.dense(x, 16, activation="relu")
    xv = np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32)
    params, (y,) = run_graph(m, {"x": xv})
    w = np.asarray(params["dense"]["kernel"])
    b = np.asarray(params["dense"]["bias"])
    expect = np.maximum(xv @ w.T + b, 0.0)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)


def test_dense_shapes_and_bias_free():
    m = make_model()
    x = m.create_tensor([4, 10], name="x")
    out = m.dense(x, 7, use_bias=False)
    assert out.shape == (4, 7)
    xv = np.ones((4, 10), np.float32)
    params, (y,) = run_graph(m, {"x": xv})
    assert "bias" not in params["dense"]


@pytest.mark.parametrize("aggr", [AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG])
def test_embedding_bag_pooling(aggr):
    m = make_model()
    idx = m.create_tensor([8, 4], DataType.DT_INT64, name="idx")
    m.embedding(idx, 50, 16, aggr)
    rng = np.random.default_rng(1)
    iv = rng.integers(0, 50, size=(8, 4)).astype(np.int64)
    # plant padding
    iv[2, 1:] = -1
    iv[5, 3] = -1
    params, (y,) = run_graph(m, {"idx": iv})
    table = np.asarray(params["embedding"]["weight"])
    expect = np.zeros((8, 16), np.float32)
    for b in range(8):
        rows = [table[i] for i in iv[b] if i >= 0]
        s = np.sum(rows, axis=0)
        expect[b] = s / len(rows) if aggr is AggrMode.AGGR_MODE_AVG else s
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-6)


def test_embedding_grad_is_scatter_add():
    """Backward must scatter-add into touched rows only (reference: the
    atomicAdd scatter kernel, src/ops/embedding.cu:192-217)."""
    from dlrm_flexflow_tpu.ops.embedding import embedding_bag

    table = jnp.asarray(np.random.default_rng(0).normal(size=(20, 8)), jnp.float32)
    idx = jnp.asarray([[0, 1], [1, 2], [19, -1]], jnp.int32)

    def f(t):
        return jnp.sum(embedding_bag(t, idx, AggrMode.AGGR_MODE_SUM))

    g = np.asarray(jax.grad(f)(table))
    expect = np.zeros((20, 8), np.float32)
    for row in [0, 1, 1, 2, 19]:
        expect[row] += 1.0
    np.testing.assert_allclose(g, expect, atol=1e-6)


def test_concat_split_roundtrip():
    m = make_model()
    a = m.create_tensor([4, 3], name="a")
    b = m.create_tensor([4, 5], name="b")
    c = m.concat([a, b], axis=1)
    outs = m.split(c, [3, 5], axis=1)
    av = np.random.rand(4, 3).astype(np.float32)
    bv = np.random.rand(4, 5).astype(np.float32)
    _, (ra, rb) = run_graph(m, {"a": av, "b": bv}, fetch=outs)
    np.testing.assert_array_equal(ra, av)
    np.testing.assert_array_equal(rb, bv)


def test_shape_ops():
    m = make_model()
    x = m.create_tensor([2, 3, 4], name="x")
    t = m.transpose(x, [0, 2, 1])
    r = m.reshape(t, [2, 12])
    f = m.flat(x)
    v = m.reverse(x, axis=2)
    xv = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    _, (tv, rv, fv, vv) = run_graph(m, {"x": xv}, fetch=[t, r, f, v])
    np.testing.assert_array_equal(tv, xv.transpose(0, 2, 1))
    np.testing.assert_array_equal(rv, xv.transpose(0, 2, 1).reshape(2, 12))
    np.testing.assert_array_equal(fv, xv.reshape(2, 12))
    np.testing.assert_array_equal(vv, xv[:, :, ::-1])


def test_elementwise_and_scalar():
    m = make_model()
    a = m.create_tensor([4, 4], name="a")
    b = m.create_tensor([4, 4], name="b")
    s = m.add(a, b)
    d = m.divide(a, b)
    sm = m.scalar_multiply(a, 2.5)
    e = m.exp(a)
    av = np.random.rand(4, 4).astype(np.float32) + 1.0
    bv = np.random.rand(4, 4).astype(np.float32) + 1.0
    _, (sv, dv, smv, ev) = run_graph(m, {"a": av, "b": bv}, fetch=[s, d, sm, e])
    np.testing.assert_allclose(sv, av + bv, rtol=1e-6)
    np.testing.assert_allclose(dv, av / bv, rtol=1e-6)
    np.testing.assert_allclose(smv, av * 2.5, rtol=1e-6)
    np.testing.assert_allclose(ev, np.exp(av), rtol=1e-5)


def test_softmax_rows_sum_to_one():
    m = make_model()
    x = m.create_tensor([8, 10], name="x")
    m.softmax(x)
    xv = np.random.default_rng(0).normal(size=(8, 10)).astype(np.float32) * 10
    _, (y,) = run_graph(m, {"x": xv})
    np.testing.assert_allclose(y.sum(axis=1), np.ones(8), rtol=1e-5)
    np.testing.assert_array_equal(np.argmax(y, axis=1), np.argmax(xv, axis=1))


def test_dropout_train_vs_eval():
    m = make_model()
    x = m.create_tensor([64, 64], name="x")
    m.dropout(x, 0.5)
    xv = np.ones((64, 64), np.float32)
    _, (y_eval,) = run_graph(m, {"x": xv}, training=False)
    np.testing.assert_array_equal(y_eval, xv)
    _, (y_train,) = run_graph(m, {"x": xv}, training=True)
    zero_frac = float((y_train == 0).mean())
    assert 0.3 < zero_frac < 0.7
    # survivors scaled by 1/keep
    assert np.allclose(y_train[y_train != 0], 2.0)


def test_dot_interaction_matches_numpy():
    m = make_model()
    xs = [m.create_tensor([4, 8], name=f"v{i}") for i in range(3)]
    m.dot_interaction(xs)
    rng = np.random.default_rng(0)
    feeds = {f"v{i}": rng.normal(size=(4, 8)).astype(np.float32) for i in range(3)}
    _, (y,) = run_graph(m, feeds)
    stacked = np.stack([feeds[f"v{i}"] for i in range(3)], axis=1)  # [4,3,8]
    z = stacked @ stacked.transpose(0, 2, 1)
    expect = np.stack([z[:, 1, 0], z[:, 2, 0], z[:, 2, 1]], axis=1)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_lstm_matches_torch():
    """LSTM op vs torch.nn.LSTM: same [i, f, g, o] gate layout, fused
    bias, zero or explicit initial state (reference analog: the NMT
    stand-alone's cuDNN LSTM cells, nmt/lstm.cu)."""
    import torch

    b, t, e, h = 4, 7, 12, 16
    rng = np.random.default_rng(3)
    xv = rng.normal(size=(b, t, e)).astype(np.float32)
    h0 = rng.normal(size=(b, h)).astype(np.float32) * 0.3
    c0 = rng.normal(size=(b, h)).astype(np.float32) * 0.3

    m = make_model()
    x = m.create_tensor([b, t, e], name="x")
    hx = m.create_tensor([b, h], name="h0")
    cx = m.create_tensor([b, h], name="c0")
    y, h_t, c_t = m.lstm(x, h, initial_state=(hx, cx), name="lstm")
    params, outs = run_graph(
        m, {"x": xv, "h0": h0, "c0": c0}, fetch=[y, h_t, c_t]
    )
    yv, hv, cv = outs

    tl = torch.nn.LSTM(e, h, batch_first=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wx"])))
        tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wh"])))
        tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["bias"])))
        tl.bias_hh_l0.zero_()
        ty, (th, tc) = tl(
            torch.from_numpy(xv),
            (torch.from_numpy(h0)[None], torch.from_numpy(c0)[None]),
        )
    np.testing.assert_allclose(yv, ty.numpy(), atol=2e-5)
    np.testing.assert_allclose(hv, th[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(cv, tc[0].numpy(), atol=2e-5)


def test_lstm_zero_state_default():
    import torch

    b, t, e, h = 3, 5, 8, 10
    rng = np.random.default_rng(5)
    xv = rng.normal(size=(b, t, e)).astype(np.float32)
    m = make_model()
    x = m.create_tensor([b, t, e], name="x")
    y, h_t, c_t = m.lstm(x, h, name="lstm")
    params, (yv,) = run_graph(m, {"x": xv}, fetch=[y])
    tl = torch.nn.LSTM(e, h, batch_first=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wx"])))
        tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wh"])))
        tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["bias"])))
        tl.bias_hh_l0.zero_()
        ty, _ = tl(torch.from_numpy(xv))
    np.testing.assert_allclose(yv, ty.numpy(), atol=2e-5)


def test_embedding_sequence_lookup_no_pooling():
    """AGGR_MODE_NONE over [B, T] token ids returns the [B, T, D] sequence
    (the NMT front end, reference nmt/embed.cu) with dense-grad row
    scatter semantics per token."""
    m = make_model()
    ids = m.create_tensor([8, 5], dtype=DataType.DT_INT32, name="ids")
    out = m.embedding(ids, 30, 6, aggr=AggrMode.AGGR_MODE_NONE, name="emb")
    assert tuple(out.shape) == (8, 5, 6)
    iv = np.random.default_rng(0).integers(0, 30, size=(8, 5)).astype(np.int32)
    params, (y,) = run_graph(m, {"ids": iv}, fetch=[out])
    w = np.asarray(params["emb"]["weight"])
    np.testing.assert_allclose(y, w[iv], atol=1e-6)
