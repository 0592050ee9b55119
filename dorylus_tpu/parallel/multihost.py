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
    """Initialize the cross-host runtime. No-op if already initialized.

    Must run before ANY backend use — even jax.process_count() initializes
    the backend and would make jax.distributed.initialize fail afterwards
    (so we check the distributed client directly, not process_count()).
    With explicit arguments, failures propagate: a half-joined cluster must
    not silently fall back to single-process (tests/test_multiprocess.py
    covers the real two-process path).
    """
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    import os
    try:
        jax.distributed.initialize()  # auto-detect (TPU pod metadata)
    except (ValueError, RuntimeError):
        # Single-host environments without cluster metadata fall back
        # quietly — but when the environment SAYS this is a cluster, a
        # bring-up failure must not silently degrade to single-process
        # (each host would train independently; round-5 review).
        claimed = any(os.environ.get(k) for k in
                      ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                       "MEGASCALE_COORDINATOR_ADDRESS"))
        # TPU_WORKER_HOSTNAMES claims a cluster only when it lists MORE
        # than one host: single-host TPU runtimes (incl. the axon tunnel)
        # set it to one hostname, which is exactly the fall-back case.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hostnames.split(",") if h.strip()]) > 1:
            claimed = True
        if claimed:
            raise
        pass


def global_mesh(n: Optional[int] = None) -> Mesh:
    """Mesh over all (or the first n) global devices on the 'graph' axis.
    Device order follows jax.devices(): hosts-major, so contiguous vertex
    shards land on the same host first — halo exchange prefers ICI before
    DCN, matching the reference's intra- vs inter-node traffic split."""
    devs = jax.devices()
    n = n or len(devs)
    return Mesh(np.array(devs[:n]), (GRAPH_AXIS,))
