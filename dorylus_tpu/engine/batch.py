"""Build device-resident GraphBatch pytrees from host-side Graphs."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dorylus_tpu.common.config import TRAIN_PORTION
from dorylus_tpu.graph.graph import Graph
from dorylus_tpu.models.base import GraphBatch


def onehot_labels(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """uint8 one-hot: the (V, C) label tensor is pure 0/1 and the loss/
    eval ops cast rows on the fly — f32 storage wasted 4x HBM at capacity
    scale (V=3.6M, C=51: 1.84 GB lane-padded vs 0.46 GB)."""
    out = np.zeros((labels.shape[0], num_classes), dtype=np.uint8)
    valid = labels >= 0
    out[np.arange(labels.shape[0])[valid], labels[valid]] = 1
    return out


def build_batch(g: Graph, for_gat: bool = False,
                edge_arrays: bool = True) -> GraphBatch:
    """Single-shard batch: the whole graph on one device.

    edge_arrays=False ships zero-length src/dst/edge_val stubs: the
    production kernel paths (GCN apply_static, GAT apply_dst/apply_unit)
    read only their plan arrays at runtime, so the E-sized COO triple is
    dead device memory (~1.2 GB at the 100M-edge capacity point) that
    also inflates padded_nbytes and shrinks the fitted msgs chunk guard
    (same idiom as the sharded fused path's (n, 0) split stubs)."""
    train_m, val_m, test_m = g.masks()
    if edge_arrays:
        edge_val = np.ones(g.num_edges, np.float32) if for_gat else g.edge_norm
        src, dst = g.src, g.dst
    else:
        src = dst = np.zeros(0, np.int32)
        edge_val = np.zeros(0, np.float32)
    return GraphBatch(
        x=jnp.asarray(g.features),
        onehot=jnp.asarray(onehot_labels(g.labels, g.num_classes)),
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_val=jnp.asarray(edge_val),
        self_val=jnp.asarray(g.self_norm),
        train_mask=jnp.asarray(train_m.astype(np.float32)),
        val_mask=jnp.asarray(val_m.astype(np.float32)),
        test_mask=jnp.asarray(test_m.astype(np.float32)),
        # Loss denominator: |V_global| * 0.66, matching the trainset_size the
        # lambdas divide by (lambda_comm.cpp:156, funcs/gcn/main.cpp:100-101).
        denom=jnp.asarray(g.num_vertices * TRAIN_PORTION, jnp.float32),
    )
