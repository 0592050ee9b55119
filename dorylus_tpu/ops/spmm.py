"""Sparse aggregation (SpMM) — the TPU-native Gather phase.

Replaces the reference's per-vertex CSC/CSR loops (Engine::aggregateGCN,
src/graph-server/engine/ops/gcn_ops.cpp:130-191 and aggregateGAT,
gat_ops.cpp:173-243) with edge-parallel gather + segment-sum, which XLA
lowers to vectorized dynamic-gather / scatter-add on TPU. The backward pass
(the reference's hand-written backward aggregate over the transposed
adjacency) falls out of autodiff: the transpose of
`gather(src) -> scale -> scatter_add(dst)` is exactly
`gather(dst) -> scale -> scatter_add(src)`.

For the optimized path see dorylus_tpu.ops.pallas_spmm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spmm_edgewise(
    h: jnp.ndarray,  # (V_table, F) feature table (local verts [+ ghosts])
    src: jnp.ndarray,  # (E,) int32 indices into the feature table
    dst: jnp.ndarray,  # (E,) int32 indices into [0, num_out)
    edge_val: jnp.ndarray,  # (E,) float edge weights (norms or attention)
    num_out: int,
) -> jnp.ndarray:
    """out[v] = sum_{e: dst[e]=v} edge_val[e] * h[src[e]].

    Padding convention: pad edges with edge_val = 0 (src/dst pointing at any
    valid index); zero weights make padding a no-op in fwd and bwd.
    """
    msgs = h[src] * edge_val[:, None].astype(h.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=num_out)


def aggregate(
    h: jnp.ndarray,  # (V, F) local vertex features
    src: jnp.ndarray,
    dst: jnp.ndarray,
    edge_val: jnp.ndarray,
    self_val: jnp.ndarray,  # (V,) self-loop norm factors
    h_table: jnp.ndarray | None = None,  # feature table incl. ghosts; default h
) -> jnp.ndarray:
    """GCN aggregation: ah = self_val * h + SpMM(edge_val, h_table).

    Matches aggregateGCN's "copy own features, scale by vtx norm factor,
    accumulate weighted neighbors" (gcn_ops.cpp:155-190).
    """
    table = h if h_table is None else h_table
    out = spmm_edgewise(table, src, dst, edge_val, h.shape[0])
    return out + h * self_val[:, None].astype(h.dtype)
