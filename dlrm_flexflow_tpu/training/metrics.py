"""Metrics: PerfMetrics accumulation + streaming AUC.

TPU-native analog of the reference Metrics/PerfMetrics (reference:
include/metrics_functions.h:26-43, src/metrics_functions/metrics_functions.cu,
future-folding UPDATE_METRICS_TASK at src/runtime/model.cc:2109-2131). The
per-partition GPU metric kernels + Legion future reduction become one pure
function computing a PerfMetrics pytree per step; accumulation is a pytree
add, which under pjit is automatically a cross-chip reduction when batches
are sharded.

AUC (absent in the reference; required by BASELINE.md) is computed in
streaming form: fixed-bin histograms of positive/negative scores, AUC by
trapezoidal ROC integration. Histograms add across steps and hosts.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ffconst import MetricsType

AUC_BINS = 8192


def zero_perf_metrics(with_auc: bool = True) -> Dict[str, jax.Array]:
    z = {
        "train_all": jnp.zeros((), jnp.int32),
        "train_correct": jnp.zeros((), jnp.int32),
        "cce_loss": jnp.zeros((), jnp.float32),
        "sparse_cce_loss": jnp.zeros((), jnp.float32),
        "mse_loss": jnp.zeros((), jnp.float32),
        "rmse_loss": jnp.zeros((), jnp.float32),
        "mae_loss": jnp.zeros((), jnp.float32),
    }
    if with_auc:
        z["auc_pos_hist"] = jnp.zeros((AUC_BINS,), jnp.float32)
        z["auc_neg_hist"] = jnp.zeros((AUC_BINS,), jnp.float32)
    return z


def compute_perf_metrics(
    metrics: MetricsType, logits, labels, binary: bool
) -> Dict[str, jax.Array]:
    """One batch worth of PerfMetrics (reference: Metrics::compute per-part
    task, metrics_functions.cu:247+). `binary` selects 0.5-threshold accuracy
    (the reference DLRM accuracy definition, dlrm.cc:131-134) vs argmax."""
    out = zero_perf_metrics(with_auc=bool(metrics & MetricsType.METRICS_AUC_ROC))
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    out["train_all"] = jnp.asarray(b, jnp.int32)

    if metrics & MetricsType.METRICS_ACCURACY:
        if binary:
            pred = (logits.reshape(b, -1)[:, 0] > 0.5).astype(jnp.int32)
            truth = (labels.reshape(b, -1)[:, 0] > 0.5).astype(jnp.int32)
        else:
            pred = jnp.argmax(logits.reshape(b, -1), axis=-1).astype(jnp.int32)
            lab = labels.reshape(b, -1)
            truth = (
                lab[:, 0].astype(jnp.int32)
                if lab.shape[1] == 1
                else jnp.argmax(lab, axis=-1).astype(jnp.int32)
            )
        out["train_correct"] = jnp.sum((pred == truth).astype(jnp.int32))

    eps = 1e-7
    if metrics & MetricsType.METRICS_CATEGORICAL_CROSSENTROPY:
        lab = labels.astype(jnp.float32).reshape(logits.shape)
        out["cce_loss"] = -jnp.sum(lab * jnp.log(jnp.clip(logits, eps, 1.0)))
    if metrics & MetricsType.METRICS_SPARSE_CATEGORICAL_CROSSENTROPY:
        idx = labels.reshape(b).astype(jnp.int32)
        p = jnp.take_along_axis(
            jnp.clip(logits.reshape(b, -1), eps, 1.0), idx[:, None], axis=-1
        )
        out["sparse_cce_loss"] = -jnp.sum(jnp.log(p))
    if metrics & (
        MetricsType.METRICS_MEAN_SQUARED_ERROR
        | MetricsType.METRICS_ROOT_MEAN_SQUARED_ERROR
        | MetricsType.METRICS_MEAN_ABSOLUTE_ERROR
    ):
        lab = labels.astype(jnp.float32).reshape(logits.shape)
        diff = logits - lab
        per_sample_mse = jnp.mean(diff * diff, axis=tuple(range(1, logits.ndim)))
        out["mse_loss"] = jnp.sum(per_sample_mse)
        out["rmse_loss"] = jnp.sum(jnp.sqrt(per_sample_mse))
        out["mae_loss"] = jnp.sum(
            jnp.mean(jnp.abs(diff), axis=tuple(range(1, logits.ndim)))
        )

    if metrics & MetricsType.METRICS_AUC_ROC:
        score = jnp.clip(logits.reshape(b, -1)[:, 0], 0.0, 1.0 - 1e-6)
        lab = labels.astype(jnp.float32).reshape(b, -1)[:, 0]
        bins = (score * AUC_BINS).astype(jnp.int32)
        pos = jnp.zeros((AUC_BINS,), jnp.float32).at[bins].add(lab)
        neg = jnp.zeros((AUC_BINS,), jnp.float32).at[bins].add(1.0 - lab)
        out["auc_pos_hist"] = pos
        out["auc_neg_hist"] = neg
    return out


def accumulate(total: Dict[str, jax.Array], batch: Dict[str, jax.Array]):
    """Fold one step into the running totals (reference:
    PerfMetrics::update via UPDATE_METRICS_TASK future chain)."""
    return jax.tree_util.tree_map(lambda a, b: a + b, total, batch)


def auc_from_histograms(pos_hist, neg_hist) -> float:
    """Trapezoidal ROC-AUC from score histograms. With scores descending,
    AUC = sum over bins of TPR-average * FPR-increment."""
    import numpy as np

    pos = np.asarray(pos_hist, np.float64)[::-1]  # high score first
    neg = np.asarray(neg_hist, np.float64)[::-1]
    p, n = pos.sum(), neg.sum()
    if p == 0 or n == 0:
        return 0.5
    tpr = np.cumsum(pos) / p
    fpr = np.cumsum(neg) / n
    tpr = np.concatenate([[0.0], tpr])
    fpr = np.concatenate([[0.0], fpr])
    return float(np.trapezoid(tpr, fpr))


def summarize(total: Dict[str, jax.Array], metrics: MetricsType) -> Dict[str, float]:
    """Host-side report (reference: PerfMetrics::print, metrics_functions.cc:47)."""
    import numpy as np

    n = max(int(total["train_all"]), 1)
    out: Dict[str, float] = {"samples": float(n)}
    if metrics & MetricsType.METRICS_ACCURACY:
        out["accuracy"] = float(total["train_correct"]) / n
    if metrics & MetricsType.METRICS_CATEGORICAL_CROSSENTROPY:
        out["cce"] = float(total["cce_loss"]) / n
    if metrics & MetricsType.METRICS_SPARSE_CATEGORICAL_CROSSENTROPY:
        out["sparse_cce"] = float(total["sparse_cce_loss"]) / n
    if metrics & MetricsType.METRICS_MEAN_SQUARED_ERROR:
        out["mse"] = float(total["mse_loss"]) / n
    if metrics & MetricsType.METRICS_ROOT_MEAN_SQUARED_ERROR:
        out["rmse"] = float(total["rmse_loss"]) / n
    if metrics & MetricsType.METRICS_MEAN_ABSOLUTE_ERROR:
        out["mae"] = float(total["mae_loss"]) / n
    if metrics & MetricsType.METRICS_AUC_ROC:
        out["auc"] = auc_from_histograms(total["auc_pos_hist"], total["auc_neg_hist"])
    return out
