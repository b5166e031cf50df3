"""Full-model trajectory parity vs a torch oracle (VERDICT r2 item 6).

BASELINE.md requires matching the reference's loss curves within run-to-run
variance. The reference's oracle protocol is op-level
(/root/reference/tests/ops/test_harness.py:44-77 — dump inputs, run both,
allclose); this scales it to the WHOLE model: a tiny DLRM with identical
init and data trains N steps in torch and here, and the loss trajectories
and final weights must match — single-device AND on the 8-device mesh
(flat, routed, and packed-pool exchange variants).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from dlrm_flexflow_tpu import (
    AdamOptimizer,
    FFConfig,
    LossType,
    SGDOptimizer,
)
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

CFG = DLRMConfig(
    sparse_feature_size=8,
    embedding_size=[120, 84, 260, 96],
    embedding_bag_size=1,
    mlp_bot=[4, 16, 8],
    mlp_top=[40, 16, 1],
    batch_size=32,
)
BS = 32


def _data(steps, seed, unique_rows=False):
    rng = np.random.RandomState(seed)
    feeds, labels = [], []
    for _ in range(steps):
        f = {"dense_features": rng.randn(BS, 4).astype(np.float32)}
        for t, v in enumerate(CFG.embedding_size):
            if unique_rows:
                idx = rng.permutation(v)[:BS].astype(np.int64)[:, None]
            else:
                idx = rng.randint(0, v, (BS, 1)).astype(np.int64)
            f[f"sparse_{t}"] = idx
        feeds.append(f)
        labels.append((rng.rand(BS, 1) > 0.5).astype(np.float32))
    return feeds, labels


class _TorchDLRM(torch.nn.Module):
    """Exact torch mirror of models/dlrm.py build_dlrm for the tiny config:
    bot MLP (relu) -> sum-pool embeddings -> cat -> top MLP (relu, last
    sigmoid)."""

    def __init__(self, weights):
        super().__init__()
        self.bot = torch.nn.ModuleList()
        for i in range(len(CFG.mlp_bot) - 1):
            lin = torch.nn.Linear(CFG.mlp_bot[i], CFG.mlp_bot[i + 1])
            w = weights[f"bot_mlp_{i}"]
            lin.weight.data = torch.tensor(np.asarray(w["kernel"]))
            lin.bias.data = torch.tensor(np.asarray(w["bias"]))
            self.bot.append(lin)
        self.tables = torch.nn.ModuleList()
        for t, v in enumerate(CFG.embedding_size):
            emb = torch.nn.EmbeddingBag(
                v, CFG.sparse_feature_size, mode="sum", sparse=True
            )
            emb.weight.data = torch.tensor(
                np.asarray(weights[f"table_{t}"]["weight"])
            )
            self.tables.append(emb)
        self.top = torch.nn.ModuleList()
        for i in range(len(CFG.mlp_top) - 1):
            lin = torch.nn.Linear(CFG.mlp_top[i], CFG.mlp_top[i + 1])
            w = weights[f"top_mlp_{i}"]
            lin.weight.data = torch.tensor(np.asarray(w["kernel"]))
            lin.bias.data = torch.tensor(np.asarray(w["bias"]))
            self.top.append(lin)

    def forward(self, dense, sparse):
        x = dense
        for lin in self.bot:
            x = torch.relu(lin(x))
        ly = [emb(s) for emb, s in zip(self.tables, sparse)]
        z = torch.cat([x] + ly, dim=1)
        for i, lin in enumerate(self.top):
            z = lin(z)
            z = torch.sigmoid(z) if i == len(self.top) - 1 else torch.relu(z)
        return z


def _torch_trajectory(weights, feeds, labels, opt_kind, lr):
    tm = _TorchDLRM(weights)
    dense_params = [p for n, p in tm.named_parameters() if "tables" not in n]
    sparse_params = [p for n, p in tm.named_parameters() if "tables" in n]
    if opt_kind == "sgd":
        opt = torch.optim.SGD(tm.parameters(), lr=lr)
        opts = [opt]
    elif opt_kind == "sgdm":
        opts = [torch.optim.SGD(tm.parameters(), lr=lr, momentum=0.9)]
    else:
        opts = [
            torch.optim.Adam(dense_params, lr=lr, eps=1e-8),
            torch.optim.SparseAdam(sparse_params, lr=lr, eps=1e-8),
        ]
    losses = []
    for f, y in zip(feeds, labels):
        for o in opts:
            o.zero_grad()
        out = tm(
            torch.tensor(f["dense_features"]),
            [torch.tensor(f[f"sparse_{t}"]) for t in range(CFG.num_tables)],
        )
        p = out.clamp(1e-7, 1 - 1e-7)
        yt = torch.tensor(y)
        loss = -(yt * torch.log(p) + (1 - yt) * torch.log(1 - p)).mean()
        loss.backward()
        for o in opts:
            o.step()
        losses.append(float(loss))
    return losses, tm


def _ours_trajectory(opt, feeds, labels, mesh=None, plan=None,
                     init_weights=None, packed="auto"):
    m = make_dlrm_model(
        CFG,
        FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                 onehot_embedding_threshold=0, packed_tables=packed),
    )
    m.compile(opt, LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False,
              mesh=mesh, plan=plan)
    if init_weights is not None:
        _load_weights(m, init_weights)
    losses = [
        float(m.train_batch(f, y)) for f, y in zip(feeds, labels)
    ]
    return losses, m


def _logical_weights(m):
    out = {}
    for op in m.graph.compute_ops:
        if op.name == "embedding_collection":
            pool = m.get_weights(op.name)["pool"]
            for t in range(CFG.num_tables):
                out[f"table_{t}"] = {
                    "weight": np.asarray(op.layout.extract_table(
                        jnp.asarray(pool), t
                    ))
                }
        elif op.params:
            out[op.name] = m.get_weights(op.name)
    return out


def _load_weights(m, weights):
    """Push logical per-table/dense weights into any model variant
    (single-table, collection pool, packed pool)."""
    for op in m.graph.compute_ops:
        if op.name == "embedding_collection":
            lay = op.layout
            n, r, d = lay.num_shards, lay.r_pad, lay.dim
            pool = np.zeros((n, r, d), np.float32)
            for i, (t, start, length) in enumerate(lay.subs):
                off = int(lay.row_offset[i])
                pool[lay.owner[i], off : off + length] = weights[
                    f"table_{t}"
                ]["weight"][start : start + length]
            if lay.packed_pool:
                pool = pool.reshape(lay.param_shape())
            m.set_weights(op.name, {"pool": pool})
        elif op.params and op.name in weights:
            m.set_weights(op.name, weights[op.name])


def test_trajectory_sgd_single_device_matches_torch():
    feeds, labels = _data(50, seed=21)
    ours, m = _ours_trajectory(SGDOptimizer(lr=0.1), feeds, labels)
    w0 = None
    # replay torch from the SAME initial weights: rebuild to grab them
    m0 = make_dlrm_model(
        CFG, FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                      onehot_embedding_threshold=0)
    )
    m0.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY, [],
               donate=False)
    w0 = _logical_weights(m0)
    ref, tm = _torch_trajectory(w0, feeds, labels, "sgd", lr=0.1)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
    # final weights too (tables + one dense layer)
    wf = _logical_weights(m)
    np.testing.assert_allclose(
        wf["table_0"]["weight"],
        tm.tables[0].weight.detach().numpy(), rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        wf["top_mlp_1"]["kernel"],
        tm.top[1].weight.detach().numpy(), rtol=2e-3, atol=2e-4,
    )


@pytest.mark.parametrize("variant", ["flat", "routed", "routed_packed"])
def test_trajectory_sgd_mesh_matches_torch(variant):
    n = 8
    feeds, labels = _data(50, seed=22)
    m0 = make_dlrm_model(
        CFG, FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                      onehot_embedding_threshold=0)
    )
    m0.compile(SGDOptimizer(lr=0.1), LossType.LOSS_BINARY_CROSSENTROPY, [],
               donate=False)
    w0 = _logical_weights(m0)
    ref, _ = _torch_trajectory(w0, feeds, labels, "sgd", lr=0.1)

    plan = dlrm_hybrid_plan()
    if variant != "flat":
        plan.exchange = "routed"
        plan.routed_cap_factor = 0.0
        plan.table_split = [2 if v >= 96 else 1 for v in CFG.embedding_size]
    plan.packed_pool = variant == "routed_packed"
    ours, _ = _ours_trajectory(
        SGDOptimizer(lr=0.1), feeds, labels,
        mesh=make_mesh((n,), ("data",)), plan=plan, init_weights=w0,
    )
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-4)


@pytest.mark.parametrize("packed", ["off", "on"])
def test_trajectory_adam_matches_torch(packed):
    """20 Adam steps vs torch Adam (dense) + SparseAdam (embeddings).
    Unique rows per batch: with no duplicate rows our lazy-Adam semantics
    coincide with torch.optim.SparseAdam exactly."""
    feeds, labels = _data(20, seed=23, unique_rows=True)
    m0 = make_dlrm_model(
        CFG, FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                      onehot_embedding_threshold=0)
    )
    m0.compile(AdamOptimizer(alpha=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
               [], donate=False)
    w0 = _logical_weights(m0)
    ref, tm = _torch_trajectory(w0, feeds, labels, "adam", lr=0.01)

    m = make_dlrm_model(
        CFG,
        FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                 onehot_embedding_threshold=0, packed_tables=packed),
    )
    m.compile(AdamOptimizer(alpha=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
              [], donate=False)
    _load_weights(m, w0)
    ours = [float(m.train_batch(f, y)) for f, y in zip(feeds, labels)]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)
    wf = _logical_weights(m)
    np.testing.assert_allclose(
        wf["table_2"]["weight"],
        tm.tables[2].weight.detach().numpy(), rtol=2e-3, atol=3e-4,
    )


def test_trajectory_momentum_packed_all_rows_matches_torch():
    """Momentum SGD on the PACKED lazy-momentum kernel vs torch's dense
    momentum: with vocab == batch and a full permutation each step every
    row is touched every step, so lazy velocity decay equals torch's dense
    decay exactly and torch is a valid oracle (VERDICT r2 item 3's
    momentum leg at full-model scale)."""
    g = globals()
    old_cfg = g["CFG"]
    g["CFG"] = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[32, 32, 32, 32],
        embedding_bag_size=1,
        mlp_bot=[4, 16, 8],
        mlp_top=[40, 16, 1],
        batch_size=32,
    )
    try:
        feeds, labels = _data(25, seed=29, unique_rows=True)
        m0 = make_dlrm_model(
            CFG, FFConfig(batch_size=BS, compute_dtype="float32", seed=11,
                          onehot_embedding_threshold=0)
        )
        m0.compile(
            SGDOptimizer(lr=0.05, momentum=0.9),
            LossType.LOSS_BINARY_CROSSENTROPY, [], donate=False,
        )
        w0 = _logical_weights(m0)
        ours, m = _ours_trajectory(
            SGDOptimizer(lr=0.05, momentum=0.9), feeds, labels,
            init_weights=w0, packed="on",
        )
        assert any(
            getattr(op, "packed", False) for op in m.graph.compute_ops
        ), "packed lazy-momentum kernel must be on the tested path"
        ref, tm = _torch_trajectory(w0, feeds, labels, "sgdm", lr=0.05)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)
        wf = _logical_weights(m)
        np.testing.assert_allclose(
            wf["table_0"]["weight"],
            tm.tables[0].weight.detach().numpy(), rtol=2e-3, atol=3e-4,
        )
    finally:
        g["CFG"] = old_cfg
