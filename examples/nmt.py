"""Encoder-decoder LSTM NMT (reference: the legacy nmt/ stand-alone —
nmt/nmt.cc:33-47 config, nmt/rnn.cu:298-327 graph: src/dst embeddings,
stacked encoder-decoder LSTM with hx/cx threading, vocab linear +
data-parallel softmax CE). The reference hand-pipelines 10-step LSTM
chunks across GPUs (nmt/rnn.h:24); the TPU version runs each layer as one
lax.scan and scales by sharding batch/hidden dims through the plan."""
import sys

sys.path.insert(0, ".")

import numpy as np

from dlrm_flexflow_tpu import FFConfig, LossType, SGDOptimizer
from dlrm_flexflow_tpu.models import zoo


def main():
    cfg = FFConfig(batch_size=64)
    cfg.update_from_args()
    # reference defaults scaled down so the example runs anywhere; pass
    # --batch-size etc. to grow it
    model = zoo.nmt(
        batch_size=cfg.batch_size, src_len=20, dst_len=20,
        hidden_size=256, embed_size=256, vocab_size=4096,
        num_layers=2, config=cfg,
    )
    model.compile(
        SGDOptimizer(lr=cfg.learning_rate),
        LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY, [],
    )
    rng = np.random.RandomState(cfg.seed)
    n = cfg.batch_size * 8
    # synthetic copy task: predict the dst tokens (teacher forcing), the
    # reference's benchmark protocol (dummy word data, nmt/nmt.cc)
    src = rng.randint(0, 4096, (n, 20)).astype(np.int32)
    dst = rng.randint(0, 4096, (n, 20)).astype(np.int32)
    hist = model.fit(
        {"src_tokens": src, "dst_tokens": dst}, dst,
        epochs=cfg.epochs, verbose=True,
    )
    print(hist)


if __name__ == "__main__":
    main()
