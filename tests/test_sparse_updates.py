"""Sparse-embedding-update path: numerical equivalence with dense autodiff.

The sparse path (FFModel.compile split-gradient trainer) must produce
bit-comparable parameters to the dense jax.grad path for plain SGD — the
reference's correctness contract between its scatter backward
(embedding.cu:192-217) and a dense gradient.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dlrm_flexflow_tpu import FFConfig, LossType, SGDOptimizer
from dlrm_flexflow_tpu.training.optimizer import RowWiseAdagradOptimizer
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan


CFG = DLRMConfig(
    sparse_feature_size=8,
    embedding_size=[300, 100, 450, 64],
    embedding_bag_size=2,
    mlp_bot=[4, 8],
    mlp_top=[40, 8, 1],
    batch_size=32,
)


def _train(opt, steps=4, mesh=None, plan=None):
    m = make_dlrm_model(
        CFG,
        FFConfig(batch_size=32, compute_dtype="float32", seed=5, onehot_embedding_threshold=0),
    )
    m.compile(opt, LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False, mesh=mesh, plan=plan)
    feeds, labels = random_batches(CFG, 32 * steps, seed=3)
    losses = []
    for i in range(steps):
        sl = slice(i * 32, (i + 1) * 32)
        losses.append(float(m.train_batch({k: v[sl] for k, v in feeds.items()}, labels[sl])))
    return m, losses


class _DenseOnlySGD(SGDOptimizer):
    # forces the dense autodiff path (every built-in optimizer now has a
    # sparse rule, so the opt-out is explicit)
    supports_sparse = False


def test_sparse_sgd_matches_dense_sgd():
    m1, l1 = _train(SGDOptimizer(lr=0.1, weight_decay=0.0))
    assert m1._sparse_names == {"table_0", "table_1", "table_2", "table_3"}
    m2, l2 = _train(_DenseOnlySGD(lr=0.1, weight_decay=0.0))
    assert m2._sparse_names == set()
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    p1, p2 = m1.get_parameters(), m2.get_parameters()
    for op in p1:
        for k in p1[op]:
            np.testing.assert_allclose(
                np.asarray(p1[op][k]), np.asarray(p2[op][k]), rtol=2e-4, atol=1e-6
            )


def test_sparse_path_sharded_matches_unsharded():
    mesh = make_mesh()
    m1 = make_dlrm_model(
        CFG, FFConfig(batch_size=32, compute_dtype="float32", seed=5, onehot_embedding_threshold=0)
    )
    m1.compile(
        SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY, [],
        donate=False, mesh=mesh, plan=dlrm_hybrid_plan(),
    )
    assert m1._sparse_names == {"embedding_collection"}
    m2 = make_dlrm_model(
        CFG, FFConfig(batch_size=32, compute_dtype="float32", seed=5, onehot_embedding_threshold=0)
    )
    m2.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False)
    # graft m1's initial params onto m2 (dense names match; tables come out
    # of the collection pool) so trajectories are comparable
    coll = next(op for op in m1.graph.compute_ops if op.name == "embedding_collection")
    p1 = m1.get_parameters()
    p2 = dict(m2.get_parameters())
    for name, sub in p1.items():
        if name == "embedding_collection":
            for t in range(len(CFG.embedding_size)):
                p2[f"table_{t}"] = {"weight": coll.layout.extract_table(sub["pool"], t)}
        else:
            p2[name] = sub
    m2.set_parameters(p2)

    feeds, labels = random_batches(CFG, 32 * 4, seed=3)
    l1, l2 = [], []
    for i in range(4):
        sl = slice(i * 32, (i + 1) * 32)
        batch = {k: v[sl] for k, v in feeds.items()}
        l1.append(float(m1.train_batch(batch, labels[sl])))
        l2.append(float(m2.train_batch(batch, labels[sl])))
    np.testing.assert_allclose(l1, l2, rtol=1e-4)
    # final tables equal too
    pf1 = m1.get_parameters()["embedding_collection"]["pool"]
    for t in range(len(CFG.embedding_size)):
        np.testing.assert_allclose(
            np.asarray(coll.layout.extract_table(pf1, t)),
            np.asarray(m2.get_parameters()[f"table_{t}"]["weight"]),
            rtol=1e-4, atol=1e-6,
        )


def test_rowwise_adagrad_trains_and_is_sparse():
    m, losses = _train(RowWiseAdagradOptimizer(lr=0.05), steps=6)
    assert len(m._sparse_names) == 4
    assert losses[-1] < losses[0] + 0.05  # moving, not diverging
    st = m._opt_state["sparse"]["table_0"]
    assert st.shape == (300,)
    assert float(jnp.sum(st)) > 0.0  # accumulator got hits


def test_rowwise_adagrad_sparse_matches_dense_formula():
    opt = RowWiseAdagradOptimizer(lr=0.1, epsilon=1e-10)
    table = jnp.ones((6, 4), jnp.float32)
    acc = jnp.zeros((6,), jnp.float32)
    rows = jnp.asarray([1, 3, 1], jnp.int32)  # duplicate row 1
    grads = jnp.asarray(np.full((3, 4), 2.0), jnp.float32)
    new_table, new_acc = opt.sparse_row_update(table, acc, rows, grads)
    # row 1 hit twice: acc = 4+4 = 8; rows updated with rsqrt(acc_total)
    np.testing.assert_allclose(np.asarray(new_acc), [0, 8, 0, 4, 0, 0], rtol=1e-6)
    scale1 = 0.1 / np.sqrt(8 + 1e-10)
    np.testing.assert_allclose(
        np.asarray(new_table[1]), 1.0 - 2 * scale1 * 2.0, rtol=1e-5
    )
    # untouched rows unchanged
    np.testing.assert_allclose(np.asarray(new_table[0]), np.ones(4), rtol=0)


def test_onehot_small_tables_match_gather():
    """Small-vocab tables via one-hot MXU matmul must equal the gather path."""
    import jax
    from dlrm_flexflow_tpu.ops.embedding import embedding_bag, embedding_bag_onehot
    from dlrm_flexflow_tpu.ffconst import AggrMode

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(500, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 500, size=(32, 3)), jnp.int32)
    idx = idx.at[0, 1:].set(-1)
    for aggr in (AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG):
        a = embedding_bag(table, idx, aggr)
        b = embedding_bag_onehot(table, idx, aggr, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_onehot_threshold_routes_small_tables_dense():
    m = make_dlrm_model(
        CFG, FFConfig(batch_size=32, compute_dtype="float32", onehot_embedding_threshold=200)
    )
    m.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False)
    # vocab 100 and 64 go dense/one-hot; 300 and 450 stay sparse
    assert m._sparse_names == {"table_0", "table_2"}
    feeds, labels = random_batches(CFG, 32, seed=0)
    assert np.isfinite(float(m.train_batch(feeds, labels)))


def test_sparse_adam_single_table_packed_matches_scatter():
    """Single-table lazy Adam: packed kernel path (packed_tables=on) must
    match the scatter path step for step at the model level."""
    from dlrm_flexflow_tpu import AdamOptimizer

    losses = {}
    params = {}
    for packed in ("off", "on"):
        m = make_dlrm_model(
            CFG,
            FFConfig(batch_size=32, compute_dtype="float32", seed=5,
                     onehot_embedding_threshold=0, packed_tables=packed),
        )
        m.compile(AdamOptimizer(alpha=0.02, weight_decay=0.001),
                  LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False)
        assert m._sparse_names == {"table_0", "table_1", "table_2", "table_3"}
        feeds, labels = random_batches(CFG, 32 * 3, seed=3)
        ls = []
        for i in range(3):
            sl = slice(i * 32, (i + 1) * 32)
            ls.append(float(m.train_batch(
                {k: v[sl] for k, v in feeds.items()}, labels[sl])))
        losses[packed] = ls
        params[packed] = m.get_weights("table_0")["weight"]
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-4, atol=1e-5)
    # the packed path streams bf16 deltas (round 5: f32 streams ran the
    # one-hot matmuls at ~8x the cost and put the Adam step at 84 ms, the
    # same convention as the SGD path), so weights track the f32 scatter
    # oracle within bf16 per-update rounding, not bit-exactly
    np.testing.assert_allclose(params["on"], params["off"], rtol=2e-3, atol=2e-4)


def test_lazy_sparse_adam_matches_torch_sparseadam():
    """Oracle: torch.optim.SparseAdam on a coalesced sparse gradient has
    the exact lazy semantics our sparse path implements (for duplicate-free
    rows, where summed-squares == squared-sum)."""
    import torch

    from dlrm_flexflow_tpu.training.optimizer import AdamOptimizer

    rng = np.random.RandomState(0)
    V, D, K = 64, 8, 16
    w0 = rng.randn(V, D).astype(np.float32)
    opt = AdamOptimizer(alpha=0.01)
    state = opt.sparse_init((V, D))
    w = jnp.asarray(w0)

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SparseAdam([tw], lr=0.01, betas=(opt.beta1, opt.beta2),
                                  eps=opt.epsilon)
    for step in range(1, 4):
        rows = rng.choice(V, K, replace=False).astype(np.int32)  # unique
        g = rng.randn(K, D).astype(np.float32)
        t = float(step)
        alpha_t = 0.01 * np.sqrt(1 - opt.beta2 ** t) / (1 - opt.beta1 ** t)
        w, state = opt.sparse_row_update(
            w, state, jnp.asarray(rows), jnp.asarray(g), lr=alpha_t
        )
        topt.zero_grad()
        tw.grad = torch.sparse_coo_tensor(
            torch.tensor(rows.astype(np.int64))[None, :], torch.tensor(g),
            (V, D),
        )
        topt.step()
    np.testing.assert_allclose(
        np.asarray(w), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sparse_momentum_single_table_packed_matches_scatter():
    from dlrm_flexflow_tpu import SGDOptimizer as _SGD

    losses = {}
    for packed in ("off", "on"):
        m = make_dlrm_model(
            CFG,
            FFConfig(batch_size=32, compute_dtype="float32", seed=5,
                     onehot_embedding_threshold=0, packed_tables=packed),
        )
        m.compile(_SGD(lr=0.1, momentum=0.9),
                  LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False)
        assert len(m._sparse_names) == 4
        feeds, labels = random_batches(CFG, 32 * 3, seed=3)
        ls = []
        for i in range(3):
            sl = slice(i * 32, (i + 1) * 32)
            ls.append(float(m.train_batch(
                {k: v[sl] for k, v in feeds.items()}, labels[sl])))
        losses[packed] = ls
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-4, atol=1e-5)
