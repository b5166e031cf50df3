"""MNIST MLP via the Keras facade (reference: examples/python/keras/
func_mnist_mlp.py + examples/python/native/mnist_mlp.py). Runs on synthetic
digits when the real dataset is absent (zero-egress environments)."""
import sys

sys.path.insert(0, ".")

import numpy as np

from dlrm_flexflow_tpu.frontends import keras as K
from dlrm_flexflow_tpu.training.callbacks import VerifyMetrics


def synthetic_mnist(n=8192, seed=0):
    """Linearly-separable digit-like blobs: accuracy should clear 0.9."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 10, n)
    centers = rng.randn(10, 784).astype(np.float32) * 2.0
    x = centers[y] + rng.randn(n, 784).astype(np.float32) * 0.5
    return x, np.eye(10, dtype=np.float32)[y]


def main():
    x, y = synthetic_mnist()
    model = K.Sequential([
        K.Dense(512, activation="relu"),
        K.Dense(512, activation="relu"),
        K.Dense(10),
        K.Softmax(),
    ])
    model.compile(optimizer="sgd", loss="categorical_crossentropy",
                  metrics=["accuracy"], input_shape=[784], batch_size=64)
    hist = model.fit(x, y, epochs=2, verbose=True,
                     callbacks=[VerifyMetrics("accuracy", 0.9)])
    print(hist)


if __name__ == "__main__":
    main()
