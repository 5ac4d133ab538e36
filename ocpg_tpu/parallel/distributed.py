"""Multi-host (DCN) initialization.

The reference's multi-node story is torchrun/SLURM env plumbing + NCCL
process groups (`/root/reference/util/misc.py:449-487`).  The JAX equivalent
is `jax.distributed.initialize`: every host starts the same program, the
runtime wires DCN between slices, and `jax.devices()` then returns the
GLOBAL device list, so the same 1-D "data" mesh code scales from one chip to
a multi-slice pod — XLA routes gradient all-reduces over ICI within a slice
and DCN across slices.

Environment contract (mirrors torchrun's env:// rendezvous, misc.py:455-466):
  OCPG_COORDINATOR   "host:port" of process 0   (<-> MASTER_ADDR/PORT)
  OCPG_NUM_PROCESSES world size                 (<-> WORLD_SIZE)
  OCPG_PROCESS_ID    this host's rank           (<-> RANK)
On TPU pods with the cloud metadata service these are auto-detected and
`jax.distributed.initialize()` needs no arguments.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if configured; returns True when distributed.

    No-ops (returns False) when neither args nor OCPG_* env vars request a
    multi-process run, so single-host flows are untouched.
    """
    import jax

    coordinator = coordinator or os.environ.get("OCPG_COORDINATOR")
    num_processes = num_processes or _int_env("OCPG_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("OCPG_PROCESS_ID")

    if coordinator is None and num_processes is None:
        # auto-detection path (TPU pod metadata); only attempt when requested
        if os.environ.get("OCPG_AUTO_DISTRIBUTED"):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_index() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 gate for writes (reference util/misc.py:444-446)."""
    return process_index() == 0
