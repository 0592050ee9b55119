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

Why NOT lax.ragged_all_to_all (which would send each (shard, peer)
pair's exact row count like the reference's exact ZMQ scatter, instead
of padding to the pair max): XLA:CPU cannot lower ragged-all-to-all
(UNIMPLEMENTED in the ThunkEmitter, verified on jax 0.9), which would
make the hermetic CPU suite and the virtual-mesh dryrun impossible. The
padding waste is bounded by (max_h - need_ij) rows per pair and LDG/
METIS partitions keep pair needs balanced; revisit if a real pod profile
shows halo bytes dominating.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dorylus_tpu.parallel.mesh import GRAPH_AXIS


def halo_exchange(h: jnp.ndarray, send_idx: jnp.ndarray,
                  axis_name: str = GRAPH_AXIS, plan=None) -> jnp.ndarray:
    """h: (vp, F) local features; send_idx: (n_shards, max_h) local rows.
    Returns feature table (vp + n_shards*max_h, F): local rows then ghosts
    grouped by owner shard. Must run inside shard_map over `axis_name`."""
    return jnp.concatenate([h, halo_recv(h, send_idx, axis_name, plan)],
                           axis=0)


def halo_recv(h: jnp.ndarray, send_idx: jnp.ndarray,
              axis_name: str = GRAPH_AXIS, plan=None) -> jnp.ndarray:
    """Ghost rows only: (n_shards*max_h, F). Used by the overlap path,
    where interior aggregation proceeds concurrently with this collective.

    plan: optional (order, rows) from build_recv_plan — routes the
    backward through a SORTED segment_sum instead of the gather-VJP's
    XLA scatter-add (the slowest lowering on TPU; the degree kernel
    exists for the same reason, ops/degree_spmm.py)."""
    if plan is not None:
        return _halo_recv_planned(axis_name, h, send_idx, plan[0], plan[1])
    buf = h[send_idx]  # (n_shards, max_h, F)
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv.reshape(-1, h.shape[1])


def build_recv_plan(send_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side backward plan for one shard's send lists: (order, rows)
    with order a stable argsort of the flattened send_idx and rows the
    sorted local row per flat send slot. The halo backward then reduces
    returned ghost gradients with segment_sum(g[order], rows, sorted=True)
    — rows repeat when a local row is sent to several peers, and the
    zero-padded send slots simply accumulate zero into row 0."""
    flat = np.asarray(send_idx).ravel()
    order = np.argsort(flat, kind="stable").astype(np.int32)
    return order, flat[order].astype(np.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _halo_recv_planned(axis_name, h, send_idx, order, rows):
    buf = h[send_idx]  # (n_shards, max_h, F)
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv.reshape(-1, h.shape[1])


def _planned_fwd(axis_name, h, send_idx, order, rows):
    out = _halo_recv_planned(axis_name, h, send_idx, order, rows)
    # dtype token: residuals must be jax values, not dtype objects.
    return out, (send_idx, order, rows, h.shape[0], jnp.zeros((), h.dtype))


def _planned_bwd(axis_name, res, g):
    send_idx, order, rows, vp, dtype_token = res
    dtype = dtype_token.dtype
    n, mh = send_idx.shape
    # Ghost-gradient return trip: the tiled split0/concat0 all_to_all is a
    # block permutation (i -> j), so applying it again sends each block
    # back to its owner (the reference's backward scatter of "bg" grads,
    # gcn_ops.cpp backward dir).
    gmine = jax.lax.all_to_all(g.reshape(n, mh, -1), axis_name,
                               split_axis=0, concat_axis=0, tiled=True)
    gflat = gmine.reshape(n * mh, -1).astype(jnp.float32)
    dh = jax.ops.segment_sum(gflat[order], rows, num_segments=vp,
                             indices_are_sorted=True)
    return dh.astype(dtype), None, None, None


_halo_recv_planned.defvjp(_planned_fwd, _planned_bwd)
