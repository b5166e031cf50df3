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
