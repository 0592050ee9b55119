"""Sharded Pallas SpMM: one uniform SPMD chain program for all shards.

shard_map compiles ONE program for every device, so the per-shard chain
plans (ops/pallas_spmm.py) must share identical static shapes. This module
builds each shard's plan with stage dims forced to the cross-shard maxima
(retrying with bigger dims when a shard overflows them), stacks the plan
arrays along a leading shard axis (sharded over the 'graph' mesh axis),
and exposes the same .static/.apply surface as PallasSpMM, so models use
it unchanged via batch.aux["spmm"].

All shards share the same edge count (padded ep), table width
(vp + n_shards*max_h) and output rows (vp) by construction
(graph/partition.py), so only stage dims need forcing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dorylus_tpu.graph.partition import ShardedGraph
from dorylus_tpu.ops.pallas_spmm import (
    _NeedBiggerDims,
    _plan_arrays,
    _plan_static,
    build_chain_plan,
    pallas_spmm_apply,
)


def _uniform_plans(edge_lists, num_in, num_out, seg_chunks, tile,
                   n_stages: int = 3):
    """Build one plan per shard with identical stage dims."""
    dims = None
    for _ in range(6):  # dims grow monotonically; converges fast
        plans = []
        try:
            for src, dst in edge_lists:
                if dims is None:
                    raise _NeedBiggerDims(None)
                plans.append(build_chain_plan(
                    src, dst, num_in, num_out, seg_chunks, tile,
                    force_dims=dims))
            return plans
        except _NeedBiggerDims:
            new_dims = []
            for src, dst in edge_lists:
                from dorylus_tpu.ops.pallas_spmm import _needed_dims
                d = _needed_dims(src, dst, num_in, num_out, seg_chunks,
                                 tile, n_stages)
                if not new_dims:
                    new_dims = list(d)
                else:
                    new_dims = [tuple(max(a, b) for a, b in zip(x, y))
                                for x, y in zip(new_dims, d)]
            if dims is not None:
                new_dims = [tuple(max(a, b) for a, b in zip(x, y))
                            for x, y in zip(new_dims, dims)]
            dims = new_dims
    raise RuntimeError("uniform plan dims did not converge")


class ShardedPallasSpMM:
    """Per-shard chain SpMM with uniform statics; arrays stacked on a
    leading shard axis for PartitionSpec('graph', ...)."""

    def __init__(self, sharded: ShardedGraph, seg_chunks: int = 1024,
                 tile: int = 1024, interpret: bool | None = None):
        if interpret is None:
            interpret = jax.default_backend() in ("cpu",)
        n = sharded.n_shards
        table = sharded.vp + n * sharded.max_h
        vp = sharded.vp

        fwd_lists = [(s.src, s.dst) for s in sharded.shards]
        bwd_lists = [(s.dst, s.src) for s in sharded.shards]
        fwd_plans = _uniform_plans(fwd_lists, table, vp, seg_chunks, tile)
        bwd_plans = _uniform_plans(bwd_lists, vp, table, seg_chunks, tile)

        def stack(plans):
            arrs = [_plan_arrays(p) for p in plans]
            return jax.tree.map(lambda *xs: np.stack(
                [np.asarray(x) for x in xs]), *arrs)

        self.arrays = {
            "fwd": stack(fwd_plans),
            "bwd": stack(bwd_plans),
            "src": np.stack([np.asarray(s.src, np.int32)
                             for s in sharded.shards]),
            "dst": np.stack([np.asarray(s.dst, np.int32)
                             for s in sharded.shards]),
        }
        self.static = (_plan_static(fwd_plans[0]), _plan_static(bwd_plans[0]),
                       table, interpret,
                       "bfloat16" if sharded.ep > 4_000_000 else None)
        self.fwd_plans = fwd_plans

    def apply(self, arrays: dict, h: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
        """Call inside shard_map with this shard's (squeezed) arrays."""
        return pallas_spmm_apply(self.static, arrays, h, val)
