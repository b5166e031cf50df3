"""Multi-host launch helper.

TPU-native analog of the reference launcher (reference: python/flexflow.py —
builds `mpirun -n nodes ... flexflow_python script.py -ll:gpu G`; and the
control-replication model, mapper.cc:267-281: the same program runs on every
node). On TPU pods the runtime already launches one process per host; this
module provides:

  initialize(coordinator, num_processes, process_id)
      -> jax.distributed.initialize + sanity prints (the SPMD multi-controller
         analog of control replication; SURVEY §2.6)

  CLI:  python -m dlrm_flexflow_tpu.launch --nodes N --node-rank R \
            --coordinator host:port script.py [script args...]
      runs `script.py` in-process after distributed init (every host runs
      the same command, as with mpirun single-program mode).
"""
from __future__ import annotations

import os
import runpy
import sys
from typing import Optional


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX multi-controller runtime. No-op on a single host with
    no coordinator (matches reference behavior of running without mpirun)."""
    import jax

    if coordinator is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"[launch] process {jax.process_index()}/{jax.process_count()} "
        f"local_devices={jax.local_device_count()} global={jax.device_count()}"
    )


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    nodes = int(os.environ.get("NNODES", "1"))
    rank = int(os.environ.get("NODE_RANK", "0"))
    script = None
    rest = []
    i = 0
    while i < len(args):
        a = args[i]
        if script is not None:
            # everything after the script positional belongs to the script
            rest.append(a)
        elif a == "--nodes":
            i += 1
            nodes = int(args[i])
        elif a == "--node-rank":
            i += 1
            rank = int(args[i])
        elif a == "--coordinator":
            i += 1
            coordinator = args[i]
        else:
            script = a
        i += 1
    assert script, "usage: python -m dlrm_flexflow_tpu.launch [opts] script.py ..."
    initialize(coordinator, nodes if nodes > 1 else None, rank if nodes > 1 else None)
    sys.argv = [script] + rest
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
