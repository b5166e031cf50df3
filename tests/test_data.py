"""Data pipeline tests: loader, criteo schema IO, scanned multi-step fit."""
import os

import numpy as np
import pytest

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.data.criteo import load_criteo, preprocess_raw_tsv, save_synthetic_criteo
from dlrm_flexflow_tpu.data.loader import DataLoader
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model


CFG = DLRMConfig(
    sparse_feature_size=8,
    embedding_size=[100, 200],
    embedding_bag_size=1,
    mlp_bot=[4, 8],
    mlp_top=[24, 8, 1],
    batch_size=16,
)


def test_loader_batches_cover_dataset_in_order():
    feeds, labels = random_batches(CFG, 64, seed=0)
    dl = DataLoader(feeds, labels, 16)
    seen = []
    for batch, lbl in dl.epoch():
        assert batch["dense_features"].shape == (16, 4)
        seen.append(lbl)
    assert len(seen) == 4
    np.testing.assert_array_equal(np.concatenate(seen), labels)


def test_loader_shuffle_changes_order_but_not_set():
    feeds, labels = random_batches(CFG, 64, seed=0)
    labels = np.arange(64, dtype=np.float32)[:, None]
    dl = DataLoader(feeds, labels, 16, shuffle=True, seed=1)
    got = np.concatenate([l for _, l in dl.epoch()])
    assert not np.array_equal(got, labels)
    np.testing.assert_array_equal(np.sort(got, axis=0), labels)


def test_stacked_epoch_shapes_and_tail():
    feeds, labels = random_batches(CFG, 16 * 5, seed=0)
    dl = DataLoader(feeds, labels, 16)
    chunks = list(dl.stacked_epoch(2))
    shapes = [lbl.shape[0] for _, lbl in chunks]
    assert shapes == [2, 2, 1]
    assert chunks[0][0]["dense_features"].shape == (2, 16, 4)


def test_criteo_npz_roundtrip(tmp_path):
    path = str(tmp_path / "criteo.npz")
    save_synthetic_criteo(path, 128, [100, 200], num_dense=13, seed=0)
    feeds, labels, vocabs = load_criteo(path)
    assert feeds["dense_features"].shape == (128, 13)
    assert feeds["sparse_0"].shape == (128, 1)
    assert labels.shape == (128, 1)
    assert len(vocabs) == 2 and vocabs[0] <= 100 and vocabs[1] <= 200


def test_preprocess_raw_tsv(tmp_path):
    raw = tmp_path / "day.tsv"
    rows = [
        "1\t" + "\t".join(str(i) for i in range(13)) + "\t" + "\t".join(["a1f"] * 26),
        "0\t" + "\t".join([""] * 13) + "\t" + "\t".join([""] * 26),
    ]
    raw.write_text("\n".join(rows) + "\n")
    out = str(tmp_path / "day.npz")
    n, vocabs = preprocess_raw_tsv(str(raw), out)
    assert n == 2 and len(vocabs) == 26
    feeds, labels, _ = load_criteo(out)
    # log transform: first int feature of row 0 is log(0+1)=0
    assert feeds["dense_features"][0, 0] == 0.0
    assert feeds["dense_features"][0, 1] == pytest.approx(np.log(2.0))
    # missing ints -> 0; missing cats -> 0
    assert feeds["dense_features"][1].sum() == 0.0
    assert feeds["sparse_0"][1, 0] == 0
    assert feeds["sparse_0"][0, 0] == int("a1f", 16)


def test_scanned_fit_matches_per_step_fit():
    feeds, labels = random_batches(CFG, 16 * 8, seed=3)

    def make():
        m = make_dlrm_model(CFG, FFConfig(batch_size=16, compute_dtype="float32", seed=9))
        m.compile(SGDOptimizer(lr=0.05), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY], donate=False)
        return m

    m1 = make()
    m1.fit(feeds, labels, epochs=2, verbose=False, steps_per_call=1)
    m2 = make()
    m2.fit(feeds, labels, epochs=2, verbose=False, steps_per_call=4)
    r1, r2 = m1.get_metrics(), m2.get_metrics()
    assert r1["samples"] == r2["samples"]
    p1, p2 = m1.get_parameters(), m2.get_parameters()
    import jax

    for op in p1:
        for k in p1[op]:
            np.testing.assert_allclose(
                np.asarray(p1[op][k]), np.asarray(p2[op][k]), rtol=1e-5, atol=1e-6
            )


def test_native_batcher_matches_numpy():
    from dlrm_flexflow_tpu.data.native_batcher import available, gather_batch

    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000, 7)).astype(np.float32)
    b = rng.integers(0, 50, size=(1000, 3)).astype(np.int64)
    idx = rng.permutation(1000)[:256]
    outs = gather_batch([a, b], idx)
    np.testing.assert_array_equal(outs[0], a[idx])
    np.testing.assert_array_equal(outs[1], b[idx])
    assert available(), "native ffdata library failed to build"


def test_loader_shuffled_batches_use_native_gather():
    from dlrm_flexflow_tpu.data.loader import DataLoader

    rng = np.random.default_rng(1)
    feeds = {"x": rng.normal(size=(64, 5)).astype(np.float32)}
    labels = rng.integers(0, 2, size=(64, 1)).astype(np.float32)
    dl = DataLoader(feeds, labels, 16, shuffle=True, seed=3)
    seen = []
    for batch, lbl in dl.epoch():
        assert batch["x"].shape == (16, 5) and lbl.shape == (16, 1)
        # row correspondence feeds<->labels must survive the gather
        for r in range(16):
            row = batch["x"][r]
            j = np.where((feeds["x"] == row).all(axis=1))[0][0]
            assert lbl[r, 0] == labels[j, 0]
            seen.append(j)
    assert sorted(seen) == list(range(64))


def test_load_criteo_h5_fixture(tmp_path):
    """The reference's primary dataset format (HDF5 X_int/X_cat/y,
    examples/cpp/DLRM/dlrm.cc:281-325) loads via the same schema."""
    h5py = pytest.importorskip("h5py")
    from dlrm_flexflow_tpu.data.criteo import load_criteo

    rng = np.random.RandomState(0)
    x_int = rng.rand(32, 13).astype(np.float32)
    x_cat = rng.randint(0, 50, (32, 4)).astype(np.int64)
    y = rng.randint(0, 2, 32).astype(np.float32)
    path = str(tmp_path / "criteo.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("X_int", data=x_int)
        f.create_dataset("X_cat", data=x_cat)
        f.create_dataset("y", data=y)
    feeds, labels, vocabs = load_criteo(path)
    np.testing.assert_allclose(feeds["dense_features"], x_int)
    np.testing.assert_array_equal(feeds["sparse_2"][:, 0], x_cat[:, 2])
    assert labels.shape == (32, 1)
    assert vocabs == [int(x_cat[:, i].max()) + 1 for i in range(4)]
