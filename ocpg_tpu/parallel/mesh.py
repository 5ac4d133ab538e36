"""Device-mesh parallelism helpers.

Replaces the reference's DDP/NCCL stack (`util/misc.py:449-487`, DDP wrap
`main.py:61-63`) with `jax.sharding`: one jitted SPMD program over a Mesh.

Axes:
  * "data" — shards the (batch) dimension; frames ride batch, so video clips
    and frames distribute across chips and gradients are reduced over ICI by
    XLA (the DDP all-reduce equivalent, inserted automatically).

The reference's multiprocess inference sharding (`inference_davis.py:97-109`)
maps to the same mesh: videos are just more batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place leading-axis-sharded batch arrays onto the mesh."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def prefetch_to_mesh(iterator, mesh: Mesh, size: int = 2, axis: str = "data"):
    """Double-buffered device prefetch: yields `(host_batch, device_batch)`
    with the NEXT batch's host->device transfer already issued.

    `jax.device_put` is async, so while the device executes step k the host
    decodes batch k+1 AND its transfer rides the wire — the transfer leaves
    the critical path.  The reference gets the same overlap implicitly from
    CUDA's async H2D under torch DataLoader pinned memory
    (/root/reference/main.py:197-214); under the tunneled TPU runtime the
    transfer is long enough that forgetting this costs ~a transfer per step
    (measured in PROFILE.md, loader-in-the-loop section).
    """
    from collections import deque

    buf = deque()
    for batch in iterator:
        buf.append((batch, shard_batch(mesh, batch, axis)))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def batch_pspec(mesh: Mesh, batch, axis: str = "data"):
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, batch)
