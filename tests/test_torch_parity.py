"""Op-level numerical parity vs PyTorch — forward AND gradients.

The reference's op test harness builds 1-op FlexFlow programs and asserts
outputs/grads against PyTorch references (reference: tests/ops/
test_harness.py:44-77, per-op targets like linear_test.cc,
batch_matmul_test.cc; the DLRM dot interaction mirrors its DotCompressor
module, test_harness.py:97+). Same strategy here: 1-op graphs, shared
random inputs, torch.autograd as the oracle, grads compared for inputs
and parameters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dlrm_flexflow_tpu import FFConfig, FFModel, PoolType
from dlrm_flexflow_tpu.core.graph import OpContext
from dlrm_flexflow_tpu.ffconst import ActiMode, AggrMode


def _jax_out_and_grads(model, feeds, params=None, wrt=()):
    """Returns (y, {name: grad}) with grads of sum(y^2)/2 wrt the given
    (op_name, param_name) pairs and all float inputs."""
    if params is None:
        params = model.graph.init_params(jax.random.PRNGKey(0))
    ctx = OpContext(training=True, rng=jax.random.PRNGKey(1),
                    compute_dtype=jnp.float32)

    float_feeds = {k: v for k, v in feeds.items()
                   if np.issubdtype(np.asarray(v).dtype, np.floating)}
    other = {k: v for k, v in feeds.items() if k not in float_feeds}

    def loss_fn(params, ffeeds):
        (y,) = model.graph.execute(params, {**other, **ffeeds}, ctx)
        return 0.5 * jnp.sum(y.astype(jnp.float32) ** 2), y

    (loss, y), (gp, gf) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, {k: jnp.asarray(v) for k, v in float_feeds.items()})
    grads = {}
    for op_name, p_name in wrt:
        grads[f"{op_name}.{p_name}"] = np.asarray(gp[op_name][p_name])
    for k in float_feeds:
        grads[k] = np.asarray(gf[k])
    return np.asarray(y), grads, params


def _torch_loss(y):
    return 0.5 * (y.float() ** 2).sum()


def test_dense_relu_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 12)).astype(np.float32)
    m = FFModel(FFConfig(batch_size=8, compute_dtype="float32"))
    t = m.create_tensor([8, 12], name="x")
    m.dense(t, 7, activation=ActiMode.AC_MODE_RELU, name="fc")
    y, grads, params = _jax_out_and_grads(
        m, {"x": x}, wrt=[("fc", "kernel"), ("fc", "bias")]
    )
    w = np.asarray(params["fc"]["kernel"])  # [out, in]
    b = np.asarray(params["fc"]["bias"])
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    bt = torch.tensor(b, requires_grad=True)
    yt = F.relu(F.linear(xt, wt, bt))
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["x"], xt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["fc.kernel"], wt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["fc.bias"], bt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 9, 9)).astype(np.float32)
    m = FFModel(FFConfig(batch_size=2, compute_dtype="float32"))
    t = m.create_tensor([2, 3, 9, 9], name="x")
    m.conv2d(t, 5, 3, 3, 2, 2, 1, 1, name="cv")
    y, grads, params = _jax_out_and_grads(
        m, {"x": x}, wrt=[("cv", "kernel"), ("cv", "bias")]
    )
    w = np.asarray(params["cv"]["kernel"])
    b = np.asarray(params["cv"]["bias"])
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    bt = torch.tensor(b, requires_grad=True)
    yt = F.conv2d(xt, wt, bt, stride=2, padding=1)
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(grads["x"], xt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(grads["cv.kernel"], wt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(grads["cv.bias"], bt.grad.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("pool", [PoolType.POOL_MAX, PoolType.POOL_AVG])
def test_pool2d_matches_torch(pool):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    m = FFModel(FFConfig(batch_size=2, compute_dtype="float32"))
    t = m.create_tensor([2, 4, 8, 8], name="x")
    m.pool2d(t, 2, 2, 2, 2, pool_type=pool, name="pl")
    y, grads, _ = _jax_out_and_grads(m, {"x": x})
    xt = torch.tensor(x, requires_grad=True)
    if pool is PoolType.POOL_MAX:
        yt = F.max_pool2d(xt, 2, 2)
    else:
        yt = F.avg_pool2d(xt, 2, 2)
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["x"], xt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_training_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 3, 5, 5)).astype(np.float32) * 2 + 1
    m = FFModel(FFConfig(batch_size=4, compute_dtype="float32"))
    t = m.create_tensor([4, 3, 5, 5], name="x")
    m.batch_norm(t, relu=True, name="bn")
    y, grads, params = _jax_out_and_grads(
        m, {"x": x}, wrt=[("bn", "scale"), ("bn", "bias")]
    )
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(np.asarray(params["bn"]["scale"]), requires_grad=True)
    bt = torch.tensor(np.asarray(params["bn"]["bias"]), requires_grad=True)
    yt = F.relu(F.batch_norm(
        xt, None, None, wt, bt, training=True, eps=1e-5
    ))
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(grads["x"], xt.grad.numpy(), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(grads["bn.scale"], wt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(grads["bn.bias"], bt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_batch_matmul_grads_match_torch():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(3, 4, 6)).astype(np.float32)
    b = rng.normal(size=(3, 6, 5)).astype(np.float32)
    m = FFModel(FFConfig(batch_size=3, compute_dtype="float32"))
    ta = m.create_tensor([3, 4, 6], name="a")
    tb = m.create_tensor([3, 6, 5], name="b")
    m.batch_matmul(ta, tb)
    y, grads, _ = _jax_out_and_grads(m, {"a": a, "b": b})
    at = torch.tensor(a, requires_grad=True)
    bt = torch.tensor(b, requires_grad=True)
    yt = torch.bmm(at, bt)
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["a"], at.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grads["b"], bt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_softmax_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(6, 9)).astype(np.float32)
    m = FFModel(FFConfig(batch_size=6, compute_dtype="float32"))
    t = m.create_tensor([6, 9], name="x")
    m.softmax(t)
    y, grads, _ = _jax_out_and_grads(m, {"x": x})
    xt = torch.tensor(x, requires_grad=True)
    yt = F.softmax(xt, dim=-1)
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(grads["x"], xt.grad.numpy(), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("aggr", [AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG])
def test_embedding_bag_matches_torch(aggr):
    """reference: the embedding fwd gather+pool / bwd scatter kernels
    (embedding.cu:166-217); torch.nn.functional.embedding_bag oracle."""
    rng = np.random.default_rng(6)
    v, d, b, h = 50, 16, 12, 3
    idx = rng.integers(0, v, size=(b, h)).astype(np.int64)
    m = FFModel(FFConfig(batch_size=b, compute_dtype="float32"))
    from dlrm_flexflow_tpu.ffconst import DataType

    t = m.create_tensor([b, h], DataType.DT_INT64, name="idx")
    m.embedding(t, v, d, aggr, name="emb")
    y, grads, params = _jax_out_and_grads(
        m, {"idx": idx}, wrt=[("emb", "weight")]
    )
    wt = torch.tensor(np.asarray(params["emb"]["weight"]), requires_grad=True)
    mode = "sum" if aggr is AggrMode.AGGR_MODE_SUM else "mean"
    yt = F.embedding_bag(
        torch.tensor(idx), wt, mode=mode,
    )
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        grads["emb.weight"], wt.grad.numpy(), rtol=1e-4, atol=1e-5
    )


def test_dot_interaction_matches_torch_dotcompressor():
    """The DLRM dot interaction vs the reference harness's torch oracle
    (DotCompressor semantics: pairwise dots, strict lower triangle)."""
    rng = np.random.default_rng(7)
    f, d, b = 5, 8, 6
    feats = [rng.normal(size=(b, d)).astype(np.float32) for _ in range(f)]
    m = FFModel(FFConfig(batch_size=b, compute_dtype="float32"))
    ts = [m.create_tensor([b, d], name=f"f{i}") for i in range(f)]
    m.dot_interaction(ts)
    feeds = {f"f{i}": feats[i] for i in range(f)}
    y, grads, _ = _jax_out_and_grads(m, feeds)
    fts = [torch.tensor(x, requires_grad=True) for x in feats]
    stack = torch.stack(fts, dim=1)  # [B, F, D]
    z = torch.bmm(stack, stack.transpose(1, 2))  # [B, F, F]
    li, lj = torch.tril_indices(f, f, offset=-1)
    yt = z[:, li, lj]
    _torch_loss(yt).backward()
    np.testing.assert_allclose(y, yt.detach().numpy(), rtol=1e-4, atol=1e-5)
    for i in range(f):
        np.testing.assert_allclose(
            grads[f"f{i}"], fts[i].grad.numpy(), rtol=1e-4, atol=1e-5
        )
