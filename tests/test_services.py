"""Checkpoint/resume, callbacks, and LR scheduling tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlrm_flexflow_tpu import AdamOptimizer, FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.training.callbacks import (
    EarlyStopping,
    EpochVerifyMetrics,
    LearningRateScheduler,
    VerifyMetrics,
)
from dlrm_flexflow_tpu.training.checkpoint import restore_checkpoint, save_checkpoint


CFG = DLRMConfig(
    sparse_feature_size=8,
    embedding_size=[200, 300],
    embedding_bag_size=2,
    mlp_bot=[4, 8],
    mlp_top=[24, 8, 1],
    batch_size=32,
)


def make(opt=None, **ffkw):
    m = make_dlrm_model(CFG, FFConfig(batch_size=32, compute_dtype="float32", seed=7, **ffkw))
    m.compile(
        opt or SGDOptimizer(lr=0.05),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
        donate=False,
    )
    return m


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    feeds, labels = random_batches(CFG, 32 * 6, seed=1)
    m1 = make(onehot_embedding_threshold=0)
    for i in range(3):
        sl = slice(i * 32, (i + 1) * 32)
        m1.train_batch({k: v[sl] for k, v in feeds.items()}, labels[sl])
    save_checkpoint(str(tmp_path / "ckpt"), m1)

    m2 = make(onehot_embedding_threshold=0)
    manifest = restore_checkpoint(str(tmp_path / "ckpt"), m2)
    assert manifest["step"] == 3
    # continue both; trajectories must match exactly
    for i in range(3, 6):
        sl = slice(i * 32, (i + 1) * 32)
        b = {k: v[sl] for k, v in feeds.items()}
        l1 = float(m1.train_batch(b, labels[sl]))
        l2 = float(m2.train_batch(b, labels[sl]))
        assert l1 == pytest.approx(l2, rel=1e-6), (i, l1, l2)


def test_checkpoint_with_adam_state(tmp_path):
    m1 = make(AdamOptimizer(alpha=0.01))
    feeds, labels = random_batches(CFG, 32, seed=2)
    m1.train_batch(feeds, labels)
    save_checkpoint(str(tmp_path / "c2"), m1)
    m2 = make(AdamOptimizer(alpha=0.01))
    restore_checkpoint(str(tmp_path / "c2"), m2)
    assert int(m2._opt_state["dense"]["step"] if "dense" in m2._opt_state else m2._opt_state["step"]) == 1


def test_lr_scheduler_changes_rate_without_recompile():
    m = make(SGDOptimizer(lr=0.1))
    feeds, labels = random_batches(CFG, 32 * 2, seed=3)
    sched = LearningRateScheduler(lambda epoch: 0.1 * (0.5 ** epoch))
    m.fit(feeds, labels, epochs=3, verbose=False, callbacks=[sched])
    assert m.get_learning_rate() == pytest.approx(0.1 * 0.25)


def test_set_learning_rate_zero_freezes_params():
    m = make(SGDOptimizer(lr=0.1))
    feeds, labels = random_batches(CFG, 32, seed=4)
    m.set_learning_rate(0.0)
    before = jax.tree_util.tree_map(np.asarray, m.get_parameters())
    m.train_batch(feeds, labels)
    after = jax.tree_util.tree_map(np.asarray, m.get_parameters())
    for op in before:
        for k in before[op]:
            np.testing.assert_array_equal(before[op][k], after[op][k])


def test_verify_metrics_gate_raises():
    m = make()
    feeds, labels = random_batches(CFG, 32 * 2, seed=5)
    with pytest.raises(AssertionError, match="VerifyMetrics failed"):
        m.fit(feeds, labels, epochs=1, verbose=False,
              callbacks=[VerifyMetrics("accuracy", 1.01)])


def test_early_stopping_stops():
    m = make()
    feeds, labels = random_batches(CFG, 32 * 2, seed=6)

    class CountingES(EarlyStopping):
        epochs_seen = 0

        def on_epoch_end(self, model, epoch, metrics):
            CountingES.epochs_seen = epoch + 1
            return super().on_epoch_end(model, epoch, metrics)

    # patience 1 on a constant metric stops after epoch 2
    es = CountingES(metric="samples", patience=1)
    m.fit(feeds, labels, epochs=10, verbose=False, callbacks=[es])
    assert CountingES.epochs_seen < 10


def test_per_op_weight_io():
    """reference: Parameter::set_weights/get_weights numpy round trip
    (src/runtime/model.cu:338-467)."""
    from dlrm_flexflow_tpu.models.dlrm import make_dlrm_model, tiny_config
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    cfg = tiny_config(batch_size=16)
    m = make_dlrm_model(cfg, FFConfig(batch_size=16, compute_dtype="float32"))
    m.compile(SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
              [MetricsType.METRICS_ACCURACY])
    name = next(n for n in m.get_parameters() if "top_mlp" in n)
    w = m.get_weights(name)
    assert "kernel" in w
    w2 = {k: np.zeros_like(v) for k, v in w.items()}
    m.set_weights(name, w2)
    got = m.get_weights(name)
    assert all(np.all(v == 0) for v in got.values())
    feeds, labels = random_batches(cfg, 16, seed=0)
    assert np.isfinite(float(m.train_batch(feeds, labels)))


def test_host_offload_matches_device_training():
    """CPU-offload parity (reference: hetero strategies placing embeddings
    in host memory, dlrm_strategy_hetero.cc + AVX2 CPU embedding): a DLRM
    with one table offloaded to host RAM must track the all-device model's
    loss trajectory (same init, same data)."""
    from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
    from dlrm_flexflow_tpu.training.host_offload import (
        HostOffloadTrainer,
        build_host_offload_dlrm,
    )

    cfg = DLRMConfig(
        sparse_feature_size=8,
        embedding_size=[500, 40, 900],
        embedding_bag_size=2,
        mlp_bot=[4, 16, 8],
        mlp_top=[32, 16, 1],
        batch_size=16,
    )
    ffc = FFConfig(batch_size=16, compute_dtype="float32", seed=2,
                   onehot_embedding_threshold=0)
    model, host_map = build_host_offload_dlrm(cfg, ffc, offload_threshold=600)
    assert len(host_map) == 1  # the vocab-900 table
    trainer = HostOffloadTrainer(model, host_map, lr=0.05).compile(
        SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY],
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches

    feeds, labels = random_batches(cfg, 64, seed=3)
    losses = []
    for ep in range(4):
        hist = trainer.fit(feeds, labels, epochs=1)
        losses.append(hist["loss"])
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], f"host-offload DLRM failed to learn: {losses}"
    # host table actually moved
    tbl = next(iter(host_map.values()))[0]
    assert np.abs(tbl.table).max() > 0


def test_native_host_scatter_matches_numpy():
    from dlrm_flexflow_tpu.data.native_batcher import scatter_add_f32

    rng = np.random.RandomState(0)
    table = rng.randn(100, 8).astype(np.float32)
    ref = table.copy()
    idx = rng.randint(0, 100, 64).astype(np.int64)
    idx[3] = idx[7]  # duplicates
    idx[5] = -1  # padding drops
    g = rng.randn(64, 8).astype(np.float32)
    scatter_add_f32(table, idx, g, scale=-0.1)
    valid = idx >= 0
    np.subtract.at(ref, idx[valid], 0.1 * g[valid])
    np.testing.assert_allclose(table, ref, rtol=1e-5, atol=1e-6)
