"""Vertex reordering for locality.

The reference gets locality from METIS partitioning (inputs/partitioner.cpp)
and otherwise keeps file order. On TPU, locality directly buys performance:
halo exchanges shrink when neighbors share shards. These reorderings are
optional preprocessing; the train/val/test split stays bound to the ORIGINAL
vertex indices (src/common/utils.hpp:60-62 splits by file order), carried in
Graph.split_ids.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from dorylus_tpu.graph.graph import Graph


def bfs_order(g: Graph, seed: int = 0) -> np.ndarray:
    """BFS (Cuthill-McKee-ish) ordering: returns order[new_id] = old_id."""
    v = g.num_vertices
    # Undirected adjacency in CSR.
    s = np.concatenate([g.src, g.dst])
    d = np.concatenate([g.dst, g.src])
    o = np.argsort(d, kind="stable")
    col = s[o]
    counts = np.bincount(d, minlength=v)
    ptr = np.zeros(v + 1, np.int64)
    np.cumsum(counts, out=ptr[1:])

    visited = np.zeros(v, bool)
    order = np.empty(v, np.int64)
    pos = 0
    # Start from lowest-degree unvisited vertices (RCM heuristic).
    deg_order = np.argsort(counts, kind="stable")
    dq = deque()
    for start in deg_order:
        if visited[start]:
            continue
        visited[start] = True
        dq.append(start)
        while dq:
            u = dq.popleft()
            order[pos] = u
            pos += 1
            neigh = col[ptr[u]: ptr[u + 1]]
            for w in neigh[np.argsort(counts[neigh], kind="stable")]:
                if not visited[w]:
                    visited[w] = True
                    dq.append(w)
    assert pos == v
    return order


def degree_order(g: Graph) -> np.ndarray:
    """Descending-degree ordering (hub clustering)."""
    return np.argsort(-g.in_degree, kind="stable")


def apply_order(g: Graph, order: np.ndarray) -> Graph:
    """Relabel vertices: new_id i corresponds to old order[i]. The split
    keeps following original indices via split_ids."""
    v = g.num_vertices
    inv = np.empty(v, np.int64)
    inv[order] = np.arange(v)
    old_split = g.split_ids if g.split_ids is not None else np.arange(v)
    out = Graph(
        num_vertices=v,
        src=inv[g.src].astype(np.int32),
        dst=inv[g.dst].astype(np.int32),
        features=g.features[order],
        labels=g.labels[order],
        num_classes=g.num_classes,
    )
    out.split_ids = old_split[order]
    return out.finalize()
