"""Regenerate the tiny in-repo dataset fixtures (checked in; run once).

These are real-format files — canonical IDX (MNIST), CIFAR python-pickle
batches, keras-style reuters npz — so the REAL-file branches of
frontends/datasets.py run in CI without network egress (VERDICT r2 item
10; reference loaders: python/flexflow/keras/datasets/).
"""
import gzip
import os
import pickle
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write_idx_images(path, arr, gz=False):
    head = struct.pack(">i", 0x00000803) + struct.pack(
        ">iii", arr.shape[0], arr.shape[1], arr.shape[2]
    )
    data = head + arr.astype(np.uint8).tobytes()
    (gzip.open(path, "wb") if gz else open(path, "wb")).write(data)


def write_idx_labels(path, arr, gz=False):
    data = struct.pack(">i", 0x00000801) + struct.pack(
        ">i", arr.shape[0]
    ) + arr.astype(np.uint8).tobytes()
    (gzip.open(path, "wb") if gz else open(path, "wb")).write(data)


def main():
    rng = np.random.RandomState(7)

    d = os.path.join(HERE, "mnist_idx")
    os.makedirs(d, exist_ok=True)
    xtr = rng.randint(0, 255, (16, 28, 28)).astype(np.uint8)
    ytr = (np.arange(16) % 10).astype(np.uint8)
    xte = rng.randint(0, 255, (6, 28, 28)).astype(np.uint8)
    yte = (np.arange(6) % 10).astype(np.uint8)
    write_idx_images(f"{d}/train-images-idx3-ubyte.gz", xtr, gz=True)
    write_idx_labels(f"{d}/train-labels-idx1-ubyte.gz", ytr, gz=True)
    write_idx_images(f"{d}/t10k-images-idx3-ubyte.gz", xte, gz=True)
    write_idx_labels(f"{d}/t10k-labels-idx1-ubyte.gz", yte, gz=True)

    d = os.path.join(HERE, "cifar10_batches")
    os.makedirs(d, exist_ok=True)
    for i in range(1, 6):
        with open(f"{d}/data_batch_{i}", "wb") as f:
            pickle.dump({
                b"data": rng.randint(0, 255, (2, 3072)).astype(np.uint8),
                b"labels": [int(x) for x in rng.randint(0, 10, 2)],
            }, f)
    with open(f"{d}/test_batch", "wb") as f:
        pickle.dump({
            b"data": rng.randint(0, 255, (2, 3072)).astype(np.uint8),
            b"labels": [int(x) for x in rng.randint(0, 10, 2)],
        }, f)

    xs = np.asarray(
        [list(rng.randint(1, 900, rng.randint(5, 30))) for _ in range(12)],
        dtype=object,
    )
    ys = (np.arange(12) % 5).astype(np.int64)
    np.savez(
        os.path.join(HERE, "reuters_tiny.npz"),
        x_train=xs, y_train=ys, x_test=xs[:4], y_test=ys[:4],
        allow_pickle=True,
    )
    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
