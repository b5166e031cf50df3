"""Observability tests (SURVEY §5: tracing/profiling, NaN sweep, graph export)."""
import os

import numpy as np

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.models.dlrm import make_dlrm_model, tiny_config
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.utils import (
    check_numerics,
    export_task_graph,
    log_shardings,
    op_timing_report,
    print_op_timings,
)


def _tiny_model():
    cfg = tiny_config(batch_size=16)
    model = make_dlrm_model(cfg, FFConfig(batch_size=16, compute_dtype="float32"))
    model.compile(SGDOptimizer(lr=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
                  [MetricsType.METRICS_ACCURACY])
    feeds, labels = random_batches(cfg, 16, seed=0)
    return model, feeds, labels


def test_op_timing_report_covers_all_ops():
    model, feeds, _ = _tiny_model()
    rows = op_timing_report(model, feeds, reps=2, warmup=1)
    assert len(rows) == len(model.graph.compute_ops)
    assert all(r["ms"] > 0 for r in rows)
    print_op_timings(rows)  # smoke the reference-style print


def test_task_graph_export(tmp_path):
    model, _, _ = _tiny_model()
    path = str(tmp_path / "graph.dot")
    export_task_graph(model, path)
    text = open(path).read()
    assert text.startswith("digraph")
    for op in model.graph.compute_ops:
        assert f'"{op.name}"' in text


def test_check_numerics_clean_and_dirty():
    model, feeds, labels = _tiny_model()
    assert check_numerics(model, feeds, labels) == {}
    # poison the bottom-MLP weights -> NaNs must be localized and reported
    name = next(n for n in model._params if "dense" in n or "bot" in n)
    p = model._params[name]
    key = next(iter(p))
    poisoned = np.asarray(p[key]).copy()
    poisoned.flat[0] = np.nan
    p[key] = poisoned
    bad = check_numerics(model, feeds, labels)
    assert bad, "NaN sweep failed to flag poisoned activations"


def test_log_shardings_lists_params():
    model, _, _ = _tiny_model()
    rows = log_shardings(model)
    assert rows and all("shape=" in r for r in rows)


def test_profiler_trace_context(tmp_path):
    """SURVEY §5(c): trace() produces a TensorBoard-loadable profile dir."""
    import jax.numpy as jnp

    from dlrm_flexflow_tpu.utils import trace

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no profile artifacts written"
