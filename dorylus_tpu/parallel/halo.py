"""Halo (ghost vertex) exchange as a single ICI collective.

Replaces the reference's push-based scatter + ghost-receiver thread pair
(Engine::scatterGCN gcn_ops.cpp:204-260 — batch boundary features per
destination node over ZMQ PUB; ghostReceiverGCN :262-362 — parse and write
into the "fg"/"bg" ghost tensors) with one all_to_all per layer:

  1. gather: buf[p] = h[send_idx[p]]  — rows peer p needs from us
  2. all_to_all over the 'graph' mesh axis (rides ICI, XLA-scheduled)
  3. the received (n_shards, max_h, F) block IS the ghost tensor; edge
     source indices address concat(local, ghosts) directly.

The backward pass of this function (gather -> all_to_all -> concat) is
derived by autodiff: scatter-add of ghost gradients back to their owner —
exactly the reference's backward scatter of "bg" gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dorylus_tpu.parallel.mesh import GRAPH_AXIS


def halo_exchange(h: jnp.ndarray, send_idx: jnp.ndarray,
                  axis_name: str = GRAPH_AXIS) -> jnp.ndarray:
    """h: (vp, F) local features; send_idx: (n_shards, max_h) local rows.
    Returns feature table (vp + n_shards*max_h, F): local rows then ghosts
    grouped by owner shard. Must run inside shard_map over `axis_name`."""
    return jnp.concatenate([h, halo_recv(h, send_idx, axis_name)], axis=0)


def halo_recv(h: jnp.ndarray, send_idx: jnp.ndarray,
              axis_name: str = GRAPH_AXIS) -> jnp.ndarray:
    """Ghost rows only: (n_shards*max_h, F). Used by the overlap path,
    where interior aggregation proceeds concurrently with this collective."""
    buf = h[send_idx]  # (n_shards, max_h, F)
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv.reshape(-1, h.shape[1])
