"""Checkpoint / resume.

The reference has NO model checkpointing (SURVEY §5) — only
Parameter::set_weights/get_weights numpy round-trips
(src/runtime/model.cu:338-467). This module provides real train-state
checkpointing (params + optimizer state + step + metrics) as a strict
improvement, plus the reference's strategy export/import lives in
parallel.plan.ShardingPlan.save/load.

Format: a directory with one .npz per top-level group + a JSON manifest.
No pickle (robust across versions); orbax can be slotted in later for
async multi-host checkpointing.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif tree is None:
        out[prefix + "__none__"] = np.zeros(0, np.int8)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    none_paths = []
    for key, val in flat.items():
        parts = key.split("/")
        if parts[-1] == "__none__":
            if len(parts) == 1:
                return None
            none_paths.append(parts[:-1])
            continue
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    for path in none_paths:
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = None
    return root


def save_checkpoint(path: str, model, extra: Optional[Dict[str, Any]] = None) -> None:
    """Write train state: params, optimizer state, step counter, metrics."""
    os.makedirs(path, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, model.get_parameters())
    np.savez(os.path.join(path, "params.npz"), **_flatten(params))
    opt = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x),
        model._opt_state,
        is_leaf=lambda x: x is None or not isinstance(x, dict),
    )
    np.savez(os.path.join(path, "opt_state.npz"), **_flatten(opt))
    totals = jax.tree_util.tree_map(np.asarray, model._metrics_total)
    np.savez(os.path.join(path, "metrics.npz"), **_flatten(totals))
    # host-tail stores (touched tail rows + per-row optimizer state):
    # without them a resumed host-tail model would silently re-init every
    # cold row it had trained
    ht = getattr(model, "_host_tail", None)
    if ht is not None and ht.entries:
        blobs = {}
        for name, (store, *_rest) in ht.entries.items():
            rows, vals, acc = store.state()
            blobs[f"{name}/rows"] = rows
            blobs[f"{name}/vals"] = vals
            blobs[f"{name}/acc"] = acc
        np.savez(os.path.join(path, "host_tail.npz"), **blobs)
    manifest = {
        "version": 1,
        "step": int(model._step_count),
        "host_tail": bool(ht is not None and ht.entries),
        "extra": extra or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def restore_checkpoint(path: str, model) -> Dict[str, Any]:
    """Restore state saved by save_checkpoint into a compiled model.
    Shapes must match (same model/config). Returns the manifest."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)

    def load_npz(name):
        with np.load(os.path.join(path, name)) as z:
            return _unflatten({k: z[k] for k in z.files})

    params = load_npz("params.npz")
    model.set_parameters(params)
    opt = load_npz("opt_state.npz")
    model._opt_state = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.numpy.asarray(x),
        opt,
        is_leaf=lambda x: x is None or not isinstance(x, dict),
    )
    totals = load_npz("metrics.npz")
    model._metrics_total = jax.tree_util.tree_map(jax.numpy.asarray, totals)
    model._step_count = manifest["step"]
    if manifest.get("host_tail"):
        ht = getattr(model, "_host_tail", None)
        assert ht is not None and ht.entries, (
            "checkpoint carries host-tail stores but the model has none "
            "(compile with the same host_tail_threshold)"
        )
        with np.load(os.path.join(path, "host_tail.npz")) as z:
            for name, (store, *_rest) in ht.entries.items():
                acc_key = f"{name}/acc"
                store.load_state(
                    z[f"{name}/rows"], z[f"{name}/vals"],
                    z[acc_key] if acc_key in z.files else None,
                )
    # re-apply plan shardings if compiled distributed
    if model.mesh is not None and model.plan is not None:
        model._params = model.plan.shard_params(model._params, model.graph, model.mesh)
    return manifest
