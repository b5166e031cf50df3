"""Frontend tests: keras facade, torch.fx import, onnx import.

Mirrors the reference's CI strategy (reference: .circleci multi-gpu example
matrix + tests/onnx/test_onnx_import.py smoke) as small CPU runs.
"""
import numpy as np
import pytest

from dlrm_flexflow_tpu.config import FFConfig
from dlrm_flexflow_tpu.core.ffmodel import FFModel
from dlrm_flexflow_tpu.ffconst import DataType, LossType, MetricsType
from dlrm_flexflow_tpu.frontends import keras as K
from dlrm_flexflow_tpu.frontends.onnx import ONNXModel
from dlrm_flexflow_tpu.frontends.torch_fx import (
    FXNode,
    PyTorchModel,
    load_ir,
    save_ir,
    torch_to_ir,
)
from dlrm_flexflow_tpu.training.optimizer import SGDOptimizer


def test_keras_sequential_mnist_mlp_trains():
    rng = np.random.RandomState(0)
    model = K.Sequential([
        K.Dense(32, activation="relu"),
        K.Dropout(0.1),
        K.Dense(10),
        K.Softmax(),
    ])
    model.compile(optimizer="sgd", loss="categorical_crossentropy",
                  metrics=["accuracy"], input_shape=[20], batch_size=16)
    x = rng.randn(64, 20).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 64)]
    hist = model.fit(x, y, epochs=2, verbose=False)
    assert np.isfinite(hist["cce"]) if "cce" in hist else True
    assert 0.0 <= hist["accuracy"] <= 1.0
    ev = model.evaluate(x, y)
    assert 0.0 <= ev["accuracy"] <= 1.0
    pred = model.predict(x[:16])
    assert pred.shape == (16, 10)
    np.testing.assert_allclose(pred.sum(1), 1.0, rtol=1e-3)


def test_keras_functional_multi_input_concat():
    rng = np.random.RandomState(1)
    a = K.Input([8])
    b = K.Input([4])
    h = K.Concatenate(axis=1)([a, b])
    h = K.Dense(16, activation="relu")(h)
    out = K.Dense(1, activation="sigmoid")(h)
    model = K.Model([a, b], out)
    model.compile(optimizer="adam", loss="binary_crossentropy",
                  metrics=["accuracy"], batch_size=8)
    xs = [rng.randn(32, 8).astype(np.float32), rng.randn(32, 4).astype(np.float32)]
    y = rng.randint(0, 2, (32, 1)).astype(np.float32)
    hist = model.fit(xs, y, epochs=1, verbose=False)
    assert 0.0 <= hist["accuracy"] <= 1.0
    assert "throughput" in hist


def test_keras_cnn_shapes():
    img = K.Input([1, 8, 8])
    t = K.Conv2D(4, 3, padding="same", activation="relu")(img)
    t = K.MaxPooling2D(2, 2)(t)
    t = K.Flatten()(t)
    t = K.Dense(10)(t)
    out = K.Softmax()(t)
    m = K.Model(img, out)
    m.compile(loss="categorical_crossentropy", batch_size=4)
    assert m.ffmodel is not None
    x = np.random.RandomState(2).randn(8, 1, 8, 8).astype(np.float32)
    pred = m.predict(x[:4])
    assert pred.shape == (4, 10)
    assert "Conv2D" in m.summary()


def test_torch_fx_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(12, 24)
            self.act = nn.ReLU()
            self.drop = nn.Dropout(0.2)
            self.fc2 = nn.Linear(24, 24)
            self.fc3 = nn.Linear(24, 5)

        def forward(self, x):
            h = self.act(self.fc1(x))
            h2 = self.act(self.fc2(self.drop(h)))
            return torch.softmax(self.fc3(h + h2), dim=1)

    ir = torch_to_ir(Net())
    path = str(tmp_path / "net.ff")
    save_ir(ir, path)
    ir2 = load_ir(path)
    assert [n.op for n in ir] == [n.op for n in ir2]

    ff = FFModel(FFConfig(batch_size=8))
    x = ff.create_tensor([8, 12], name="x")
    out = PyTorchModel(ir2).apply(ff, [x])
    assert tuple(out.shape) == (8, 5)
    ff.compile(SGDOptimizer(lr=0.01), LossType.LOSS_CATEGORICAL_CROSSENTROPY,
               [MetricsType.METRICS_ACCURACY])
    rng = np.random.RandomState(3)
    feeds = {"x": rng.randn(32, 12).astype(np.float32)}
    labels = np.eye(5, dtype=np.float32)[rng.randint(0, 5, 32)]
    hist = ff.fit(feeds, labels, epochs=1, verbose=False)
    assert 0.0 <= hist["accuracy"] <= 1.0


def test_torch_fx_cnn_and_cat():
    pytest.importorskip("torch")
    import torch
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(1, 4, 3, padding=1)
            self.pool = nn.MaxPool2d(2, 2)
            self.flat = nn.Flatten()
            self.fc = nn.Linear(4 * 4 * 4 * 2, 3)

        def forward(self, x):
            a = self.flat(self.pool(self.conv(x)))
            b = self.flat(self.pool(self.conv(x)))
            return self.fc(torch.cat([a, b], dim=1))

    ir = torch_to_ir(Net())
    ff = FFModel(FFConfig(batch_size=4))
    x = ff.create_tensor([4, 1, 8, 8], name="img")
    out = PyTorchModel(ir).apply(ff, [x])
    assert tuple(out.shape) == (4, 3)


# --- onnx import with duck-typed proto stand-ins -----------------------------
class _A:
    def __init__(self, name, **kw):
        self.name = name
        self.ints = kw.get("ints", [])
        self.floats = kw.get("floats", [])
        self.i = kw.get("i")
        self.f = kw.get("f")
        self.s = kw.get("s")


class _N:
    def __init__(self, op_type, input, output, attribute=()):
        self.op_type = op_type
        self.input = list(input)
        self.output = list(output)
        self.attribute = list(attribute)


class _Init:
    def __init__(self, name, array):
        self.name = name
        self.array = array


class _G:
    def __init__(self, node, initializer=(), output=()):
        self.node = node
        self.initializer = list(initializer)
        self.output = list(output)


class _M:
    def __init__(self, graph):
        self.graph = graph


def test_onnx_import_mlp():
    w1 = _Init("w1", np.zeros((16, 12), np.float32))
    b1 = _Init("b1", np.zeros((16,), np.float32))
    w2 = _Init("w2", np.zeros((5, 16), np.float32))
    b2 = _Init("b2", np.zeros((5,), np.float32))
    nodes = [
        _N("Gemm", ["x", "w1", "b1"], ["h"], [_A("transB", i=1)]),
        _N("Relu", ["h"], ["hr"]),
        _N("Gemm", ["hr", "w2", "b2"], ["logits"], [_A("transB", i=1)]),
        _N("Softmax", ["logits"], ["probs"]),
    ]
    model = _M(_G(nodes, [w1, b1, w2, b2], output=[_Init("probs", None)]))
    ff = FFModel(FFConfig(batch_size=8))
    x = ff.create_tensor([8, 12], name="x")
    out = ONNXModel(model).apply(ff, {"x": x})
    assert tuple(out.shape) == (8, 5)
    ff.compile(SGDOptimizer(lr=0.1), LossType.LOSS_CATEGORICAL_CROSSENTROPY,
               [MetricsType.METRICS_ACCURACY])
    rng = np.random.RandomState(5)
    pred = ff.forward({"x": rng.randn(8, 12).astype(np.float32)})
    assert np.asarray(pred).shape == (8, 5)


def test_onnx_import_cnn_concat_split():
    conv_w = _Init("cw", np.zeros((4, 1, 3, 3), np.float32))
    nodes = [
        _N("Conv", ["x", "cw"], ["c"], [
            _A("kernel_shape", ints=[3, 3]), _A("strides", ints=[1, 1]),
            _A("pads", ints=[1, 1, 1, 1]),
        ]),
        _N("Relu", ["c"], ["cr"]),
        _N("MaxPool", ["cr"], ["p"], [
            _A("kernel_shape", ints=[2, 2]), _A("strides", ints=[2, 2]),
        ]),
        _N("Flatten", ["p"], ["f"]),
        _N("Split", ["f"], ["s1", "s2"], [
            _A("axis", i=1), _A("split", ints=[32, 32]),
        ]),
        _N("Concat", ["s1", "s2"], ["cat"], [_A("axis", i=1)]),
    ]
    model = _M(_G(nodes, [conv_w]))
    ff = FFModel(FFConfig(batch_size=2))
    x = ff.create_tensor([2, 1, 8, 8], name="x")
    out = ONNXModel(model).apply(ff, {"x": x})
    assert tuple(out.shape) == (2, 64)


# --- datasets / preprocessing (reference: keras/datasets, keras/preprocessing)
def test_datasets_and_preprocessing():
    from dlrm_flexflow_tpu.frontends.datasets import (
        Tokenizer,
        load_cifar10,
        load_mnist,
        load_reuters,
        pad_sequences,
        to_categorical,
    )

    (xtr, ytr), (xte, yte) = load_mnist(synthetic_n=200)
    assert xtr.shape == (200, 28, 28) and xtr.dtype == np.uint8
    assert set(np.unique(ytr)) <= set(range(10))

    (xtr, _), _ = load_cifar10(synthetic_n=100)
    assert xtr.shape == (100, 3, 32, 32)

    (seqs, ys), _ = load_reuters(synthetic_n=50)
    assert len(seqs) == 50 and all(isinstance(s, list) for s in seqs)

    padded = pad_sequences([[1, 2, 3], [4]], maxlen=5)
    assert padded.shape == (2, 5)
    assert list(padded[0]) == [0, 0, 1, 2, 3]
    assert list(pad_sequences([[1, 2, 3]], maxlen=2, truncating="pre")[0]) == [2, 3]
    assert list(pad_sequences([[1, 2, 3]], maxlen=2, truncating="post")[0]) == [1, 2]

    tok = Tokenizer(num_words=10)
    tok.fit_on_texts(["the cat sat", "the dog sat down"])
    seqs = tok.texts_to_sequences(["the cat", "unknown word"])
    assert seqs[0] and not seqs[1] or seqs[1] == []
    m = tok.texts_to_matrix(["the cat"])
    assert m.shape[0] == 1 and m.sum() >= 1

    oh = to_categorical(np.array([0, 2]), 3)
    assert oh.shape == (2, 3) and oh[1, 2] == 1.0


def test_keras_mnist_accuracy_gate_synthetic_surrogate():
    """The CI accuracy-gate pattern (reference: tests/accuracy_tests.sh +
    VerifyMetrics) on the SYNTHETIC mnist surrogate (zero-egress env: this
    validates the training loop + gate mechanics, not MNIST-level
    learning; the real-file loader branches are covered against the
    in-repo fixtures in test_dataset_loaders_from_repo_fixtures)."""
    from dlrm_flexflow_tpu.frontends.datasets import load_mnist, to_categorical
    from dlrm_flexflow_tpu.training.callbacks import VerifyMetrics

    (xtr, ytr), _ = load_mnist(synthetic_n=2048)
    x = (xtr.reshape(len(xtr), 784).astype(np.float32)) / 255.0
    y = to_categorical(ytr, 10)
    model = K.Sequential([
        K.Dense(128, activation="relu"),
        K.Dense(10),
        K.Softmax(),
    ])
    model.compile(optimizer="sgd", loss="categorical_crossentropy",
                  metrics=["accuracy"], input_shape=[784], batch_size=64)
    model.fit(x, y, epochs=3, verbose=False,
              callbacks=[VerifyMetrics("accuracy", 0.9)])


def test_keras_layer_called_twice_wires_both_call_sites():
    """Regression: a layer applied to two tensors must wire each call site
    to ITS input (previously the second call silently rewired both)."""
    a = K.Input([4])
    b = K.Input([4])
    shared = K.Dense(3, use_bias=False)
    out = K.Add()([shared(a), shared(b)])
    with pytest.warns(UserWarning, match="no weight sharing"):
        model = K.Model([a, b], out)
        model.compile(loss="mean_squared_error", metrics=[], batch_size=4)
    x1 = np.ones((4, 4), np.float32)
    x0 = np.zeros((4, 4), np.float32)
    y_10 = model.predict([x1, x0])
    y_01 = model.predict([x0, x1])
    y_11 = model.predict([x1, x1])
    # both inputs must influence the output
    assert np.abs(y_10).sum() > 0 and np.abs(y_01).sum() > 0
    np.testing.assert_allclose(y_11, y_10 + y_01, rtol=1e-4, atol=1e-5)


def test_onnx_attrs_real_proto_semantics():
    """Regression: real onnx protos (proto3) carry i=0/f=0.0 on EVERY
    attribute; dispatch must follow the type tag, not field presence."""
    from dlrm_flexflow_tpu.frontends.onnx import _attrs

    class _RealA:  # mimics onnx.AttributeProto: all scalar fields present
        def __init__(self, name, type_, **kw):
            self.name = name
            self.type = type_
            self.i = kw.get("i", 0)
            self.f = kw.get("f", 0.0)
            self.s = kw.get("s", b"")
            self.ints = kw.get("ints", [])
            self.floats = kw.get("floats", [])

    class _RealN:
        def __init__(self, attrs):
            self.attribute = attrs

    got = _attrs(_RealN([
        _RealA("ratio", 1, f=0.5),            # FLOAT
        _RealA("axis", 2, i=3),               # INT
        _RealA("mode", 3, s=b"constant"),     # STRING
        _RealA("pads", 7, ints=[1, 1, 1, 1]),  # INTS
    ]))
    assert got["ratio"] == 0.5
    assert got["axis"] == 3
    assert got["mode"] == "constant"
    assert got["pads"] == [1, 1, 1, 1]


def test_tf_keras_import_with_weight_transfer():
    """keras_exp analog (reference: python/flexflow/keras_exp): import a REAL
    trained tf.keras model and reproduce its predictions."""
    tf = pytest.importorskip("tensorflow")
    from dlrm_flexflow_tpu.frontends.tf_keras import from_tf_keras, load_tf_weights
    from dlrm_flexflow_tpu.ffconst import LossType as LT, MetricsType as MT
    from dlrm_flexflow_tpu.training.optimizer import SGDOptimizer as SGD

    tfm = tf.keras.Sequential([
        tf.keras.layers.Input(shape=(12,)),
        tf.keras.layers.Dense(16, activation="relu"),
        tf.keras.layers.Dense(4, activation="softmax"),
    ])
    rng = np.random.RandomState(0)
    x = rng.randn(8, 12).astype(np.float32)
    ref = np.asarray(tfm(x))

    ff, in_name = from_tf_keras(tfm, batch_size=8,
                                config=FFConfig(batch_size=8, compute_dtype="float32"))
    ff.compile(SGD(lr=0.01), LT.LOSS_CATEGORICAL_CROSSENTROPY, [MT.METRICS_ACCURACY])
    n = load_tf_weights(ff, tfm, ff._tf_weight_transfer[1])
    assert n == 2
    got = np.asarray(ff.forward({in_name: x}))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_torch_fx_embeddingbag_import():
    pytest.importorskip("torch")
    import torch
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.EmbeddingBag(50, 8, mode="sum")
            self.fc = nn.Linear(8, 3)

        def forward(self, idx):
            return self.fc(self.emb(idx))

    ir = torch_to_ir(Net())
    ops = [n.op for n in ir]
    assert "embedding" in ops
    ff = FFModel(FFConfig(batch_size=4))
    x = ff.create_tensor([4, 3], dtype=DataType.DT_INT64, name="ids")
    out = PyTorchModel(ir).apply(ff, [x])
    assert tuple(out.shape) == (4, 3)
    ff.compile(SGDOptimizer(lr=0.01), LossType.LOSS_CATEGORICAL_CROSSENTROPY,
               [MetricsType.METRICS_ACCURACY])
    rng = np.random.RandomState(0)
    pred = ff.forward({"ids": rng.randint(0, 50, (4, 3)).astype(np.int64)})
    assert np.asarray(pred).shape == (4, 3)


def test_keras_embedding_layer_trains():
    rng = np.random.RandomState(0)
    ids = K.Input([4], dtype=DataType.DT_INT64)
    e = K.Embedding(30, 8, aggr="sum")(ids)
    out = K.Dense(1, activation="sigmoid")(e)
    model = K.Model(ids, out)
    model.compile(loss="binary_crossentropy", metrics=["accuracy"], batch_size=8)
    x = rng.randint(0, 30, (32, 4)).astype(np.int64)
    y = rng.randint(0, 2, (32, 1)).astype(np.float32)
    hist = model.fit(x, y, epochs=1, verbose=False)
    assert 0.0 <= hist["accuracy"] <= 1.0


def test_mnist_idx_file_loader(tmp_path):
    """Canonical IDX-format MNIST files (as downloaded) load correctly,
    gzipped and raw (reference: keras/datasets/mnist.py load_data)."""
    import gzip as _gzip
    import struct

    from dlrm_flexflow_tpu.frontends.datasets import load_mnist

    rng = np.random.RandomState(0)

    def write_idx_images(path, arr, gz=False):
        head = struct.pack(">i", 0x00000803) + struct.pack(
            ">iii", arr.shape[0], arr.shape[1], arr.shape[2]
        )
        data = head + arr.astype(np.uint8).tobytes()
        (_gzip.open(path, "wb") if gz else open(path, "wb")).write(data)

    def write_idx_labels(path, arr, gz=False):
        data = struct.pack(">i", 0x00000801) + struct.pack(
            ">i", arr.shape[0]
        ) + arr.astype(np.uint8).tobytes()
        (_gzip.open(path, "wb") if gz else open(path, "wb")).write(data)

    xtr = rng.randint(0, 255, (12, 28, 28)).astype(np.uint8)
    ytr = rng.randint(0, 10, 12).astype(np.uint8)
    xte = rng.randint(0, 255, (5, 28, 28)).astype(np.uint8)
    yte = rng.randint(0, 10, 5).astype(np.uint8)
    d = str(tmp_path)
    write_idx_images(f"{d}/train-images-idx3-ubyte.gz", xtr, gz=True)
    write_idx_labels(f"{d}/train-labels-idx1-ubyte.gz", ytr, gz=True)
    write_idx_images(f"{d}/t10k-images-idx3-ubyte", xte)
    write_idx_labels(f"{d}/t10k-labels-idx1-ubyte", yte)
    (tr_x, tr_y), (te_x, te_y) = load_mnist(d)
    np.testing.assert_array_equal(tr_x, xtr)
    np.testing.assert_array_equal(tr_y, ytr.astype(np.int64))
    np.testing.assert_array_equal(te_x, xte)
    np.testing.assert_array_equal(te_y, yte.astype(np.int64))


def test_mnist_npz_and_cifar_pickle_loaders(tmp_path):
    import pickle as _pickle

    from dlrm_flexflow_tpu.frontends.datasets import load_cifar10, load_mnist

    rng = np.random.RandomState(1)
    xtr = rng.randint(0, 255, (8, 28, 28)).astype(np.uint8)
    ytr = rng.randint(0, 10, 8)
    np.savez(tmp_path / "mnist.npz", x_train=xtr, y_train=ytr,
             x_test=xtr[:2], y_test=ytr[:2])
    (a, b), (c, d) = load_mnist(str(tmp_path / "mnist.npz"))
    np.testing.assert_array_equal(a, xtr)

    cdir = tmp_path / "cifar"
    cdir.mkdir()
    for i in range(1, 6):
        batch = {
            b"data": rng.randint(0, 255, (4, 3072)).astype(np.uint8),
            b"labels": list(rng.randint(0, 10, 4)),
        }
        with open(cdir / f"data_batch_{i}", "wb") as f:
            _pickle.dump(batch, f)
    with open(cdir / "test_batch", "wb") as f:
        _pickle.dump({
            b"data": rng.randint(0, 255, (3, 3072)).astype(np.uint8),
            b"labels": list(rng.randint(0, 10, 3)),
        }, f)
    (cx, cy), (tx, ty) = load_cifar10(str(cdir))
    assert cx.shape == (20, 3, 32, 32) and tx.shape == (3, 3, 32, 32)
    assert len(cy) == 20 and len(ty) == 3


def test_dataset_loaders_from_repo_fixtures():
    """The real-file loader branches read the COMMITTED tiny fixtures
    (real formats: canonical gzipped IDX, CIFAR pickle batches, keras-style
    reuters npz — tests/fixtures/make_dataset_fixtures.py). Guards the
    as-downloaded paths without network egress (reference loaders:
    python/flexflow/keras/datasets/)."""
    import os

    from dlrm_flexflow_tpu.frontends.datasets import (
        load_cifar10,
        load_mnist,
        load_reuters,
    )

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    (xtr, ytr), (xte, yte) = load_mnist(os.path.join(fx, "mnist_idx"))
    assert xtr.shape == (16, 28, 28) and xtr.dtype == np.uint8
    assert list(ytr[:4]) == [0, 1, 2, 3] and xte.shape == (6, 28, 28)

    (cx, cy), (tx, ty) = load_cifar10(os.path.join(fx, "cifar10_batches"))
    assert cx.shape == (10, 3, 32, 32) and tx.shape == (2, 3, 32, 32)
    assert all(0 <= c < 10 for c in cy)

    (rx, ry), (rxe, rye) = load_reuters(os.path.join(fx, "reuters_tiny.npz"))
    assert len(rx) == 12 and len(rxe) == 4
    assert all(len(s) >= 5 for s in rx) and list(ry[:5]) == [0, 1, 2, 3, 4]
