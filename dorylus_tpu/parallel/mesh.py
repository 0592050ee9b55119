"""Device mesh helpers.

Replaces the reference's NodeManager (dshmachines parsing, master/worker
handshake, ZMQ barrier — nodemanager.cpp:19-229): jax.distributed +
Mesh construction is the membership layer, and any collective is a barrier.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

GRAPH_AXIS = "graph"  # vertex-shard axis (graph/data parallelism)


def make_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = n_shards or len(devs)
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (GRAPH_AXIS,))
