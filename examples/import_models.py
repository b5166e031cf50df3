"""Model-import frontends tour (reference: examples/python/{pytorch,onnx} +
keras_exp): bring a torch module, an ONNX graph, or a trained tf.keras model
into the framework and train/serve it."""
import sys

sys.path.insert(0, ".")

import numpy as np

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.core.ffmodel import FFModel


def torch_example():
    import torch.nn as nn

    from dlrm_flexflow_tpu.frontends.torch_fx import PyTorchModel, torch_to_ir

    net = nn.Sequential(nn.Linear(16, 32), nn.ReLU(), nn.Linear(32, 4))
    ir = torch_to_ir(net)
    ff = FFModel(FFConfig(batch_size=8))
    x = ff.create_tensor([8, 16], name="x")
    out = PyTorchModel(ir).apply(ff, [x])
    ff.compile(SGDOptimizer(lr=0.01), LossType.LOSS_CATEGORICAL_CROSSENTROPY,
               [MetricsType.METRICS_ACCURACY])
    print("torch.fx import:", out.shape)


def tf_example():
    import tensorflow as tf

    from dlrm_flexflow_tpu.frontends.tf_keras import from_tf_keras, load_tf_weights

    tfm = tf.keras.Sequential([
        tf.keras.layers.Input(shape=(16,)),
        tf.keras.layers.Dense(32, activation="relu"),
        tf.keras.layers.Dense(4, activation="softmax"),
    ])
    ff, in_name = from_tf_keras(tfm, batch_size=8,
                                config=FFConfig(batch_size=8, compute_dtype="float32"))
    ff.compile(SGDOptimizer(lr=0.01), LossType.LOSS_CATEGORICAL_CROSSENTROPY,
               [MetricsType.METRICS_ACCURACY])
    load_tf_weights(ff, tfm, ff._tf_weight_transfer[1])
    x = np.random.RandomState(0).randn(8, 16).astype(np.float32)
    ours = np.asarray(ff.forward({in_name: x}))
    theirs = np.asarray(tfm(x))
    print("tf.keras import: max |diff| =", np.abs(ours - theirs).max())


if __name__ == "__main__":
    torch_example()
    tf_example()
