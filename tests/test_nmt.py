"""NMT encoder-decoder LSTM model (reference: the legacy nmt/ stand-alone
— nmt/nmt.cc config, nmt/rnn.cu:298-327 graph). The reference
hand-pipelines LSTM_PER_NODE_LENGTH-step chunks across GPUs
(nmt/rnn.h:24); ours runs each layer as one lax.scan and shards
batch/hidden through the plan, so the tests cover single-device torch-
grade semantics (tests/test_ops_parity.py::test_lstm_matches_torch) plus
the model-level trajectory and the DP-mesh path here."""
import numpy as np
import pytest

from dlrm_flexflow_tpu import (
    AdamOptimizer,
    FFConfig,
    LossType,
    SGDOptimizer,
)
from dlrm_flexflow_tpu.models.zoo import nmt
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import data_parallel_plan


def _toy(batch_size, config=None):
    return nmt(
        batch_size=batch_size, src_len=6, dst_len=5, hidden_size=32,
        embed_size=24, vocab_size=50, num_layers=2,
        config=config or FFConfig(batch_size=batch_size,
                                  compute_dtype="float32"),
    )


def _toy_batch(n, seed=0):
    rng = np.random.RandomState(seed)
    feeds = {
        "src_tokens": rng.randint(0, 50, (n, 6)).astype(np.int32),
        "dst_tokens": rng.randint(0, 50, (n, 5)).astype(np.int32),
    }
    return feeds, feeds["dst_tokens"]


def test_nmt_builds_expected_graph():
    m = _toy(8)
    names = [op.name for op in m.graph.compute_ops]
    assert "src_embed" in names and "dst_embed" in names
    assert "enc_lstm_1" in names and "dec_lstm_1" in names
    assert names[-1] == "softmax_dp"
    out = m.graph.compute_ops[-1].outputs[0]
    assert tuple(out.shape) == (8, 5, 50)
    # encoder final state threads into the decoder layer (the reference's
    # hx/cx chain crossing the encoder/decoder boundary)
    dec0 = next(op for op in m.graph.compute_ops if op.name == "dec_lstm_0")
    assert len(dec0.inputs) == 3
    assert dec0.inputs[1].owner_op.name == "enc_lstm_0"
    assert dec0.inputs[1].owner_idx == 1  # h_T


def test_nmt_memorizes_copy_task():
    m = _toy(8)
    m.compile(AdamOptimizer(alpha=0.01),
              LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY, [])
    feeds, labels = _toy_batch(8)
    losses = [float(m.train_batch(feeds, labels)) for _ in range(60)]
    assert np.isfinite(losses).all()
    # teacher-forced single-batch memorization must cut CE deeply
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_nmt_trains_on_dp_mesh():
    mesh = make_mesh()
    n = 8 * mesh.devices.size
    m = _toy(n)
    m.compile(SGDOptimizer(lr=0.3),
              LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY, [],
              mesh=mesh, plan=data_parallel_plan())
    feeds, labels = _toy_batch(n, seed=2)
    l0 = float(m.train_batch(feeds, labels))
    l1 = float(m.train_batch(feeds, labels))

    # same data single-device: DP shards the batch, numerics must agree
    m1 = _toy(n)
    m1.compile(SGDOptimizer(lr=0.3),
               LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY, [])
    s0 = float(m1.train_batch(feeds, labels))
    s1 = float(m1.train_batch(feeds, labels))
    np.testing.assert_allclose([l0, l1], [s0, s1], rtol=1e-4)
    assert l1 < l0
