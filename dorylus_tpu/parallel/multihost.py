"""Multi-host (pod-slice) initialization.

Replaces the reference's NodeManager bring-up (dshmachines parsing +
MASTERUP/WORKERUP ZMQ handshake, nodemanager.cpp:19-107) with
jax.distributed: each host runs the same program, the coordinator is host 0,
and membership/barrier are provided by the runtime. On Cloud TPU pods the
arguments are auto-detected from the metadata environment; elsewhere pass
coordinator_address/num_processes/process_id explicitly (the analog of the
dshmachines file's line-per-node contract).

Usage (one process per host):
    from dorylus_tpu.parallel.multihost import init_multihost, global_mesh
    init_multihost()              # or init_multihost("host0:1234", 4, rank)
    mesh = global_mesh()          # 'graph' axis over ALL chips in the slice
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from dorylus_tpu.parallel.mesh import GRAPH_AXIS


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize the cross-host runtime. No-op if already initialized or
    single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-host / already-initialized environments.
        pass


def global_mesh(n: Optional[int] = None) -> Mesh:
    """Mesh over all (or the first n) global devices on the 'graph' axis.
    Device order follows jax.devices(): hosts-major, so contiguous vertex
    shards land on the same host first — halo exchange prefers ICI before
    DCN, matching the reference's intra- vs inter-node traffic split."""
    devs = jax.devices()
    n = n or len(devs)
    return Mesh(np.array(devs[:n]), (GRAPH_AXIS,))
