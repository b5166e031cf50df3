"""Two-process jax.distributed CPU test for the multi-host entry.

Validates what the single-process fake mesh CANNOT: the process-major
device-order assumption the hierarchical exchange depends on
(embedding_collection.py host grouping) and the jax.distributed
coordinator handshake in launch.py. Two processes x 4 fake CPU devices
run one hybrid (table-parallel + DP) step and must agree with the
single-process 8-device result bit-for-bit on the loss.

Reference analog: control replication — the same program launched per
node (mapper.cc:267-281, python/flexflow.py mpirun)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
coord = sys.argv[3]
if nprocs > 1:
    from dlrm_flexflow_tpu.launch import initialize
    initialize(coord, nprocs, rank)

from dlrm_flexflow_tpu import AdamOptimizer, FFConfig, LossType, MetricsType
from dlrm_flexflow_tpu.data.synthetic import random_batches
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.parallel.mesh import make_mesh
from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

n = jax.device_count()
assert n == 8, f"expected 8 global devices, got {n}"
bs = 8 * n
cfg = DLRMConfig(
    sparse_feature_size=8,
    embedding_size=[64, 200, 48, 96, 300, 500],
    embedding_bag_size=2,
    mlp_bot=[4, 16, 8],
    mlp_top=[56, 16, 1],
    batch_size=bs,
)
plan = dlrm_hybrid_plan()
plan.chips_per_host = 4  # 2 hosts x 4 -> hierarchical exchange active
plan.table_split = [2 if v >= 96 else 1 for v in cfg.embedding_size]
model = make_dlrm_model(
    cfg, FFConfig(batch_size=bs, compute_dtype="float32",
                  onehot_embedding_threshold=0)
)
model.compile(
    AdamOptimizer(alpha=0.01), LossType.LOSS_BINARY_CROSSENTROPY,
    [MetricsType.METRICS_ACCURACY],
    mesh=make_mesh((n,), ("data",)), plan=plan,
)
assert model._embedding_layout.hierarchical
feeds, labels = random_batches(cfg, bs, seed=0)
loss1 = float(model.train_batch(feeds, labels))
loss2 = float(model.train_batch(feeds, labels))
if rank == 0:
    print("RESULT " + json.dumps({"loss1": loss1, "loss2": loss2}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run(nprocs: int, timeout=420):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for r in range(nprocs):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={8 // nprocs}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(r), str(nprocs), coord],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-4000:]}"
        outs.append(out)
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in: {outs}")


def test_two_process_matches_single_process():
    single = _run(1)
    two = _run(2)
    np.testing.assert_allclose(
        [two["loss1"], two["loss2"]],
        [single["loss1"], single["loss2"]],
        rtol=1e-6,
    )
