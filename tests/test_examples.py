"""Example scripts stay runnable (reference CI analog: the multi-GPU example
matrix smoke tests, tests/multi_gpu_tests.sh)."""
import os
import runpy
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(ROOT, "examples", script), run_name="__main__")
    finally:
        sys.argv = old


def test_example_moe():
    _run("moe.py", ["-e", "1", "-b", "32"])


def test_example_import_models():
    pytest.importorskip("torch")
    pytest.importorskip("tensorflow")
    _run("import_models.py", [])


def test_example_mnist_mlp_runs():
    # shrink the run: the example trains 8192x784 for 2 epochs; monkeypatch
    # its synthetic generator via argv is not supported, so just execute the
    # builder path with a direct import
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mnist_mlp_example", os.path.join(ROOT, "examples", "mnist_mlp.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    x, y = mod.synthetic_mnist(n=256, seed=0)
    assert x.shape == (256, 784) and y.shape == (256, 10)


def test_summit_large_config_builds_and_steps():
    """reference run_summit_large.sh shape: multi-hot bags of 100 at D=64
    (scaled-down vocabs for CI) — builds, trains a step, finite loss."""
    import numpy as np

    from dlrm_flexflow_tpu import (
        FFConfig, LossType, MetricsType, SGDOptimizer,
    )
    from dlrm_flexflow_tpu.data.synthetic import random_batches
    from dlrm_flexflow_tpu.models.dlrm import (
        make_dlrm_model, summit_large_config,
    )

    cfg = summit_large_config(batch_size=8, num_tables=6)
    cfg.embedding_size = [5000] * 6  # CI-size vocabs, same shape otherwise
    model = make_dlrm_model(
        cfg, FFConfig(batch_size=8, compute_dtype="float32")
    )
    assert cfg.embedding_bag_size == 100
    model.compile(SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 8, seed=2)
    assert feeds["sparse_0"].shape == (8, 100)
    loss = model.train_batch(feeds, labels)
    assert np.isfinite(float(loss))


def test_example_nmt():
    _run("nmt.py", ["-e", "1", "-b", "8"])
