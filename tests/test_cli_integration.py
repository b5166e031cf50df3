"""End-to-end CLI integration: the reference's search-then-import workflow
(reference: strategy search exports + exit, simulator.cu:131-148; later runs
start with --import). Runs examples/dlrm.py in-process on the fake 8-device
mesh."""
import os
import runpy
import sys

import numpy as np
import pytest


def _run_dlrm(argv, tmp_path):
    old = sys.argv
    sys.argv = ["dlrm.py"] + argv
    try:
        root = os.path.join(os.path.dirname(__file__), "..")
        return runpy.run_path(os.path.join(root, "examples", "dlrm.py"),
                              run_name="__main__")
    finally:
        sys.argv = old


def test_dlrm_cli_search_export_then_import(tmp_path):
    strategy = str(tmp_path / "strategy.json")
    # search + export (reference: --budget + --export)
    _run_dlrm([
        "-e", "1", "-b", "64", "--data-size", "256", "--mesh", "8",
        "--budget", "300", "--export", strategy,
        "--arch-embedding-size", "40000-200-30000-64",
        "--arch-sparse-feature-size", "8",
        "--arch-mlp-bot", "13-16-8", "--arch-mlp-top", "40-16-1",
    ], tmp_path)
    assert os.path.exists(strategy)
    import json

    doc = json.load(open(strategy))
    assert doc.get("table_assignment"), "search did not export a placement"
    # import on a fresh run (reference: --import consumed at compile)
    _run_dlrm([
        "-e", "1", "-b", "64", "--data-size", "256", "--mesh", "8",
        "--import", strategy,
        "--arch-embedding-size", "40000-200-30000-64",
        "--arch-sparse-feature-size", "8",
        "--arch-mlp-bot", "13-16-8", "--arch-mlp-top", "40-16-1",
    ], tmp_path)
