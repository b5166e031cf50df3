"""Host-offloaded embedding tables: train tables larger than HBM.

TPU-native analog of the reference's CPU embedding offload (reference:
AVX2 CPU EmbeddingBag src/ops/embedding.cc:23-319 + hetero strategies
placing embeddings in zero-copy host memory, dlrm_strategy_hetero.cc,
strategy.cc:114-122). Tables over a size threshold live in host RAM as
numpy arrays:

  forward : rows gathered + pooled on the host (native/ffdata threaded
            gather), fed to the device as a dense [B, D] input
  backward: the jitted step additionally returns d(loss)/d(pooled rows);
            the host applies the SGD row update with the duplicate-safe
            native scatter-add — the reference's CPU embedding backward
            without its non-atomic FIXME (embedding.cc:353-361)

This makes configs whose tables exceed HBM (e.g. the real MLPerf Criteo
vocabulary, 227M+292M-row tables = 100GB+) trainable on a single chip,
at the cost of one extra device backward for the host-input gradients and
the H2D/D2H row traffic per step.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FFConfig
from ..core.ffmodel import FFModel
from ..core.graph import OpContext
from ..ffconst import ActiMode, DataType, LossType, MetricsType
from ..models.dlrm import DLRMConfig, create_mlp, interact_features
from ..training.optimizer import SGDOptimizer


class HostEmbeddingTable:
    """Host-RAM table with native threaded lookup + SGD scatter update.
    SUM pooling over the bag dim (DLRM semantics; idx < 0 = padding)."""

    def __init__(self, vocab: int, dim: int, seed: int = 0, scale: Optional[float] = None):
        rng = np.random.default_rng(seed)
        scale = np.float32(scale if scale is not None else 1.0 / np.sqrt(dim))
        # chunked float32 generation: float64 uniform() would need 2x the
        # table size in temporaries (40M-row tables are tens of GB)
        self.table = np.empty((vocab, dim), np.float32)
        chunk = max(1, (1 << 24) // dim)
        for lo in range(0, vocab, chunk):
            hi = min(lo + chunk, vocab)
            block = rng.random((hi - lo, dim), dtype=np.float32)
            self.table[lo:hi] = (block * 2.0 - 1.0) * scale

    @property
    def vocab(self) -> int:
        return self.table.shape[0]

    @property
    def dim(self) -> int:
        return self.table.shape[1]

    def lookup(self, idx: np.ndarray) -> np.ndarray:
        """idx [B] or [B, H] -> pooled [B, D] f32 (native gather + sum)."""
        from ..data.native_batcher import gather_batch

        idx = np.asarray(idx)
        if idx.ndim == 1:
            idx = idx[:, None]
        b, h = idx.shape
        flat = idx.reshape(b * h).astype(np.int64)
        safe = np.where(flat >= 0, flat, 0)
        (rows,) = gather_batch([self.table], safe)
        rows = rows.reshape(b, h, self.dim)
        rows[flat.reshape(b, h) < 0] = 0.0
        return rows.sum(axis=1)

    def apply_pooled_grads(self, idx: np.ndarray, g_pooled: np.ndarray, lr: float) -> None:
        """SGD on touched rows: every bag member gets the pooled grad
        (SUM pooling), applied with the native duplicate-safe scatter."""
        from ..data.native_batcher import scatter_add_f32

        idx = np.asarray(idx)
        if idx.ndim == 1:
            idx = idx[:, None]
        b, h = idx.shape
        g = np.asarray(g_pooled, np.float32)
        grads = np.broadcast_to(g[:, None, :], (b, h, self.dim)).reshape(b * h, self.dim)
        scatter_add_f32(self.table, idx.reshape(b * h), grads, scale=-lr)


def build_host_offload_dlrm(
    dlrm: DLRMConfig,
    config: Optional[FFConfig] = None,
    offload_threshold: int = 10_000_000,
) -> Tuple[FFModel, Dict[str, Tuple[HostEmbeddingTable, str]]]:
    """DLRM where tables with vocab > offload_threshold live on the host.
    Returns (model, host_map) with host_map: dense-input name ->
    (HostEmbeddingTable, sparse feed name). Device tables keep the normal
    embedding ops (reference: mixed GPU/CPU placement, hetero strategies)."""
    from ..ffconst import AggrMode

    cfg = config or FFConfig(batch_size=dlrm.batch_size)
    model = FFModel(cfg)
    bs = dlrm.batch_size
    dense_in = model.create_tensor([bs, dlrm.mlp_bot[0]], name="dense_features")
    x = create_mlp(model, dense_in, dlrm.mlp_bot, dlrm.sigmoid_bot, "bot_mlp")
    host_map: Dict[str, Tuple[HostEmbeddingTable, str]] = {}
    ly: List = []
    for i, vocab in enumerate(dlrm.embedding_size):
        sparse_name = f"sparse_{i}"
        if vocab > offload_threshold:
            name = f"host_emb_{i}"
            t = model.create_tensor(
                [bs, dlrm.sparse_feature_size], name=name
            )
            host_map[name] = (
                HostEmbeddingTable(vocab, dlrm.sparse_feature_size, seed=1000 + i),
                sparse_name,
            )
            ly.append(t)
        else:
            s = model.create_tensor(
                [bs, dlrm.embedding_bag_size], dtype=DataType.DT_INT64,
                name=sparse_name,
            )
            ly.append(model.embedding(
                s, vocab, dlrm.sparse_feature_size,
                aggr=AggrMode.AGGR_MODE_SUM, name=f"emb_{i}",
            ))
    z = interact_features(model, x, ly, dlrm.arch_interaction_op)
    assert z.shape[1] == dlrm.mlp_top[0], (
        f"interaction gives {z.shape[1]}, mlp_top starts at {dlrm.mlp_top[0]}"
    )
    create_mlp(model, z, dlrm.mlp_top, dlrm.sigmoid_top, "top_mlp")
    return model, host_map


class HostOffloadTrainer:
    """Train loop coupling the jitted device step with host-table updates.

    The device step additionally returns d(loss)/d(host pooled inputs)
    (one extra backward; the price of the offload). Per step:
      host gather -> device step -> D2H grads -> host scatter update.
    """

    def __init__(self, model: FFModel, host_map, lr: float = 0.01):
        self.model = model
        self.host_map = host_map
        self.lr = lr
        self._step_hg = None

    def compile(self, optimizer=None, loss_type=LossType.LOSS_BINARY_CROSSENTROPY,
                metrics=(MetricsType.METRICS_ACCURACY,)):
        m = self.model
        opt = optimizer or SGDOptimizer(lr=self.lr)
        # host tables step with plain SGD at the device optimizer's rate
        # (the reference's PS-style CPU update is also plain SGD); momentum/
        # Adam state for host tables is not supported
        if hasattr(opt, "lr"):
            self.lr = float(opt.lr)
        m.compile(opt, loss_type, list(metrics))
        graph = m.graph
        out_spec = graph.compute_ops[-1].outputs[0]
        compute_dtype = jnp.dtype(m.config.compute_dtype)
        onehot_thr = m.config.onehot_embedding_threshold
        loss_t = m.loss_type
        host_names = tuple(self.host_map.keys())

        from ..training import losses as losses_lib

        def loss_of_host_inputs(params, hf, rest, labels, rng):
            ctx = OpContext(
                training=True, rng=rng, compute_dtype=compute_dtype,
                onehot_threshold=onehot_thr,
            )
            (logits,) = graph.execute(params, {**rest, **hf}, ctx, fetch=[out_spec])
            return losses_lib.compute_loss(loss_t, logits, labels)

        base = m._train_step_raw

        def step_hg(params, opt_state, totals, feeds, labels, rng):
            hf = {k: feeds[k] for k in host_names}
            rest = {k: v for k, v in feeds.items() if k not in host_names}
            host_grads = jax.grad(loss_of_host_inputs, argnums=1)(
                params, hf, rest, labels, rng
            )
            p, o, t, loss = base(params, opt_state, totals, feeds, labels, rng)
            return p, o, t, loss, host_grads

        self._step_hg = jax.jit(step_hg)
        return self

    def train_batch(self, feeds: Dict[str, np.ndarray], labels) -> float:
        m = self.model
        feeds = dict(feeds)
        # host forward: gather + pool each offloaded table
        for name, (table, sparse_name) in self.host_map.items():
            feeds[name] = table.lookup(feeds[sparse_name])
        device_feeds = {
            k: v for k, v in feeds.items()
            if k in {iop.name for iop in m.graph.inputs}
        }
        staged, labels_d = m._stage(device_feeds, labels)
        p, o, t, loss, host_grads = self._step_hg(
            m._params, m._opt_state, m._metrics_total, staged, labels_d,
            jax.random.fold_in(jax.random.PRNGKey(m.config.seed), m._step_count),
        )
        m._params, m._opt_state, m._metrics_total = p, o, t
        m._step_count += 1
        # host backward: apply SGD row updates at the CURRENT device rate
        # (set_learning_rate / LR schedules mutate the optimizer state after
        # compile, so a compile-time snapshot would silently go stale)
        lr = self._current_lr()
        for name, (table, sparse_name) in self.host_map.items():
            table.apply_pooled_grads(
                feeds[sparse_name], np.asarray(host_grads[name]), lr
            )
        return float(loss)

    def _current_lr(self) -> float:
        st = self.model._opt_state
        if isinstance(st, dict):
            if "lr" in st:
                return float(np.asarray(st["lr"]))
            dense = st.get("dense")
            if isinstance(dense, dict) and "lr" in dense:
                return float(np.asarray(dense["lr"]))
        return self.lr

    def fit(self, feeds, labels, epochs: int = 1, verbose: bool = False):
        from ..data.loader import DataLoader

        loader = DataLoader(feeds, labels, self.model.config.batch_size)
        last = None
        for ep in range(epochs):
            self.model.reset_metrics()
            for batch, lbl in loader.epoch():
                last = self.train_batch(batch, lbl)
            if verbose:
                print(f"epoch {ep}: loss={last:.5f} {self.model.get_metrics()}")
        hist = self.model.get_metrics()
        hist["loss"] = last
        return hist
