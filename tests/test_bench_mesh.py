"""bench.py --mesh smoke on the fake CPU mesh.

Keeps the multi-chip bench path and its all-to-all GB/s reporting from
rotting (a single real chip can never exercise it): the subprocess runs
the full hybrid-plan bench on 8 fake devices and the JSON line must carry
a positive all_to_all_gbps computed from the layout's exchange bytes."""
import json
import os
import subprocess
import sys


def test_bench_mesh_reports_exchange_gbps():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['bench.py', '--config', 'tiny',"
        " '--batch-size', '256', '--steps', '4', '--warmup', '1',"
        " '--mesh', '--compute-dtype', 'float32'];"
        "import bench; bench.main()"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    assert doc["devices"] == 8
    assert doc["all_to_all_gbps"] > 0, doc
    assert doc["value"] > 0 and doc["loss"] == doc["loss"]
