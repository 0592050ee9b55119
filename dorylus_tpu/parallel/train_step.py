"""Sharded training: SPMD over vertex shards via shard_map.

The multi-node architecture of the reference — graph servers exchanging
ghost activations over ZMQ (commmanager), weight servers all-reducing
gradients via pub/sub ACK counting (weightserver.cpp:89-187) — maps to:

  - vertex shards on mesh axis 'graph' (one shard per chip),
  - per-layer halo exchange = all_to_all (parallel/halo.py),
  - replicated params; weight gradients psum'd inside the compiled step
    (the entire weight-server tier),
  - barrier = the collectives themselves.

Everything (forward, halo exchanges, backward, Adam) is ONE jitted SPMD
program per epoch step: XLA overlaps the all_to_all with local aggregation
the same way the reference overlaps scatter with Lambda compute.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.common.logging import log
from dorylus_tpu.common.metrics import EpochRecord, RunReport
from dorylus_tpu.graph.graph import Graph
from dorylus_tpu.graph.partition import ShardedGraph, partition_graph
from dorylus_tpu.models.base import GraphBatch
from dorylus_tpu.models.gat import GAT
from dorylus_tpu.models.gcn import GCN
from dorylus_tpu.ops.activations import accuracy_and_loss, row_softmax
from dorylus_tpu.optim.adam import adam_init, adam_update, sgd_update
from dorylus_tpu.parallel.halo import halo_exchange, halo_recv
from dorylus_tpu.parallel.mesh import GRAPH_AXIS, make_mesh


def _local_batch(arrs: dict, denom: float, overlap: bool
                 ) -> tuple[GraphBatch, jnp.ndarray]:
    """Squeeze the per-device leading shard axis and build a GraphBatch.
    With overlap=True the batch carries the interior/boundary edge split,
    signalling models to treat the halo callable as ghost-rows-only."""
    sq = jax.tree.map(lambda v: v[0], arrs)
    split = {k: sq[k] for k in ("src_int", "dst_int", "val_int",
                                "src_bnd", "dst_bnd", "val_bnd")} \
        if overlap else {}
    aux = {"spmm": sq["pallas"]} if "pallas" in sq else None
    batch = GraphBatch(
        x=sq["x"], onehot=sq["onehot"], src=sq["src"], dst=sq["dst"],
        edge_val=sq["edge_val"], self_val=sq["self_val"],
        train_mask=sq["train_mask"], val_mask=sq["val_mask"],
        test_mask=sq["test_mask"],
        denom=jnp.asarray(denom, jnp.float32),
        aux=aux,
        **split,
    )
    return batch, sq["send_idx"]


def build_sharded_train_step(model, cfg: TrainConfig, mesh: Mesh, denom: float):
    """Returns (step_fn, eval_fn) jitted over the mesh."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    overlap = (getattr(cfg, "overlap", True) and mesh.shape[GRAPH_AXIS] > 1
               and cfg.kernel not in ("pallas", "degree"))
    # A prefix spec: every arrs leaf is sharded along its leading shard axis
    # (including nested Pallas plan arrays).
    data_spec = P(GRAPH_AXIS)

    def _halo_fn(send_idx):
        if mesh.shape[GRAPH_AXIS] <= 1:
            return None
        if overlap:
            return lambda h: halo_recv(h, send_idx)
        return lambda h: halo_exchange(h, send_idx)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), data_spec),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, arrs):
        batch, send_idx = _local_batch(arrs, denom, overlap)
        halo = _halo_fn(send_idx)

        def local_loss(p):
            return model.loss(p, batch, halo=halo, compute_dtype=compute_dtype)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # All-reduce: the whole weight-server tier in one op.
        grads = jax.lax.psum(grads, GRAPH_AXIS)
        loss = jax.lax.psum(loss, GRAPH_AXIS)
        if cfg.adam:
            params, opt_state = adam_update(
                params, grads, opt_state, lr=cfg.learning_rate,
                beta1=cfg.beta1, beta2=cfg.beta2, eps=cfg.eps,
                weight_decay=cfg.weight_decay)
        else:
            params = sgd_update(params, grads, cfg.learning_rate)
        return params, opt_state, loss

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), data_spec, None),
             out_specs=P(),
             check_vma=False)
    def evaluate(params, arrs, which):
        batch, send_idx = _local_batch(arrs, denom, overlap)
        halo = _halo_fn(send_idx)
        probs = row_softmax(model.forward(params, batch, halo=halo))
        mask = {"train": batch.train_mask, "val": batch.val_mask,
                "test": batch.test_mask}[which]
        correct, loss, count = accuracy_and_loss(probs, batch.onehot, mask)
        stats = jnp.stack([correct, loss, count])
        return jax.lax.psum(stats, GRAPH_AXIS)

    step_jit = jax.jit(step, donate_argnums=(0, 1))
    eval_jit = jax.jit(evaluate, static_argnums=(2,))
    return step_jit, eval_jit


class ShardedEngine:
    """Multi-device engine: same surface as engine.Engine, SPMD execution."""

    def __init__(self, graph: Graph, layers: LayerConfig, cfg: TrainConfig,
                 mesh: Optional[Mesh] = None, partition_method: str = "range",
                 parts: Optional[np.ndarray] = None):
        self.graph = graph
        self.layers = layers
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_shards)
        n = self.mesh.shape[GRAPH_AXIS]
        self.sharded = partition_graph(
            graph, n, method=partition_method, parts=parts,
            for_gat=cfg.model == "gat")
        if cfg.edge_chunk == 0 and self.sharded.ep > (1 << 23):
            # Bound the per-shard (ep, F) message tensor (see engine.py).
            import dataclasses
            cfg = dataclasses.replace(cfg, edge_chunk=4_000_000)
            self.cfg = cfg
            log("auto edge_chunk=4M for %d edges/shard", self.sharded.ep)
        spmm_op = None
        stacked = self.sharded.stacked()
        if cfg.kernel == "pallas":
            # Per-shard chain plans with uniform statics (one SPMD program).
            from dorylus_tpu.ops.pallas_sharded import ShardedPallasSpMM
            spmm_op = ShardedPallasSpMM(self.sharded)
            stacked["pallas"] = spmm_op.arrays
        elif cfg.kernel == "degree":
            # Per-shard degree plans padded to uniform block-row counts.
            from dorylus_tpu.engine.engine import _max_agg_width
            from dorylus_tpu.ops.degree_sharded import ShardedDegreeSpMM
            spmm_op = ShardedDegreeSpMM(
                self.sharded, feature_dim=_max_agg_width(layers, cfg))
            stacked["pallas"] = spmm_op.arrays
        self.model = (GCN(layers, edge_chunk=cfg.edge_chunk,
                          optimize_order=cfg.optimize_order, spmm_op=spmm_op)
                      if cfg.model == "gcn"
                      else GAT(layers, edge_chunk=cfg.edge_chunk,
                               spmm_op=spmm_op))
        # Place each shard's block on its device (leading axis sharded).
        self.arrs = jax.tree.map(
            lambda v: jax.device_put(
                v, NamedSharding(self.mesh, P(GRAPH_AXIS))), stacked)
        self.params = jax.device_put(
            self.model.init_params(seed=cfg.seed),
            NamedSharding(self.mesh, P()))
        self.opt_state = jax.device_put(
            adam_init(self.params), NamedSharding(self.mesh, P())) if cfg.adam else None
        self.report = RunReport()
        self._compiled = None
        if cfg.resume and cfg.checkpoint_dir:
            from dorylus_tpu.engine.checkpoint import latest_checkpoint, load_checkpoint
            path = latest_checkpoint(cfg.checkpoint_dir)
            if path is not None:
                ck = load_checkpoint(path)
                rep = NamedSharding(self.mesh, P())
                self.params = jax.device_put(
                    jax.tree.map(jnp.asarray, ck["params"]), rep)
                if ck["opt_state"] is not None and cfg.adam:
                    self.opt_state = jax.device_put(
                        jax.tree.map(jnp.asarray, ck["opt_state"]), rep)
                log("resumed from %s", path)

    def _maybe_checkpoint(self, epoch: int) -> None:
        cfg = self.cfg
        if (cfg.checkpoint_dir and cfg.checkpoint_every
                and (epoch + 1) % cfg.checkpoint_every == 0):
            from dorylus_tpu.engine.checkpoint import save_checkpoint
            save_checkpoint(cfg.checkpoint_dir, epoch + 1, self.params,
                            self.opt_state)

    def run(self, epochs: Optional[int] = None) -> RunReport:
        epochs = epochs if epochs is not None else self.cfg.epochs
        if self._compiled is None:
            self._compiled = build_sharded_train_step(
                self.model, self.cfg, self.mesh, self.sharded.denom)
        step, evaluate = self._compiled
        cfg = self.cfg
        t_run = time.perf_counter()
        for epoch in range(epochs):
            t0 = time.perf_counter()
            self.params, self.opt_state, loss = step(
                self.params, self.opt_state, self.arrs)
            # float() forces a host transfer — reliable sync even on
            # remote/async backends where block_until_ready returns early.
            loss_f = float(loss)
            dt_ms = 1e3 * (time.perf_counter() - t0)
            acc = None
            if cfg.eval_every and (epoch % cfg.eval_every == 0 or epoch == epochs - 1):
                stats = evaluate(self.params, self.arrs, "val")
                acc = float(stats[0]) / max(1.0, float(stats[2]))
            self.report.add_epoch(EpochRecord(epoch, dt_ms, loss=loss_f, accuracy=acc))
            self._maybe_checkpoint(epoch)
            if acc is not None:
                log("Epoch %d: %.2f ms, loss %.4f, val acc %.4f",
                    epoch, dt_ms, loss_f, acc)
            if cfg.target_accuracy is not None and acc is not None and acc >= cfg.target_accuracy:
                log("Target accuracy reached at epoch %d.", epoch)
                break
        self.report.total_time_s = time.perf_counter() - t_run
        stats = evaluate(self.params, self.arrs, "val")
        self.report.final_accuracy = float(stats[0]) / max(1.0, float(stats[2]))
        stats = evaluate(self.params, self.arrs, "test")
        self.report.test_accuracy = float(stats[0]) / max(1.0, float(stats[2]))
        return self.report
