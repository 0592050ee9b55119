"""Reference-scale host pipeline exercise (round-5 verdict Next #2).

The reference trains Friendster (1.8B edges) on 32 graph servers
(/root/reference/benchmarks/run-friendster-gcn:6). This repo's capacity
story was previously extrapolated from 100M-edge measurements; this tool
EXERCISES the host-side pipeline at the reference's width and scale:

  partition-1b : generate a >=1B-edge clustered graph, range-partition it
                 32 ways, build the exact-wire ragged halo plan AND the
                 full 32-way fused-overlap hyb kernel plans (the same
                 objects a pod run ships), measuring wall time and peak
                 RSS per phase -> benchmarks/results/partition_1b_r5.json
  train-300m   : train a >=300M-edge graph for several epochs on the
                 8-way virtual CPU mesh with a single-device loss-parity
                 spot check -> benchmarks/results/sharded_300m_r5.json

Usage: python tools/scale_pipeline.py partition-1b [--edges 1e9]
       python tools/scale_pipeline.py train-300m [--edges 3e8]
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "benchmarks" / "results"


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def gen_graph(num_edges: int, deg: int, feature_dim: int, classes: int,
              seed: int = 17, cut: float = 0.1):
    from dorylus_tpu.graph.graph import clustered_synthetic_graph

    v = int(num_edges) // deg
    return clustered_synthetic_graph(v, deg, feature_dim, classes,
                                     seed=seed, window=8192, cut=cut)


def partition_1b(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dorylus_tpu.graph.partition import partition_graph
    from dorylus_tpu.ops.hyb_spmm import padded_nbytes
    from dorylus_tpu.parallel.halo import build_ragged_plan

    n = args.shards
    rec = {"requested_edges": int(args.edges), "shards": n,
           "feature_dim": args.feature_dim, "degree": args.degree,
           "phases": {}}

    t0 = time.perf_counter()
    g = gen_graph(args.edges, args.degree, args.feature_dim, 16)
    rec["phases"]["generate_s"] = round(time.perf_counter() - t0, 1)
    rec["vertices"] = int(g.num_vertices)
    rec["edges"] = int(g.num_edges)
    rec["rss_after_generate_gb"] = round(rss_gb(), 2)
    print(f"generated V={g.num_vertices} E={g.num_edges} "
          f"in {rec['phases']['generate_s']}s rss={rec['rss_after_generate_gb']}GB",
          flush=True)

    t0 = time.perf_counter()
    sharded = partition_graph(g, n, method="range")
    rec["phases"]["partition_s"] = round(time.perf_counter() - t0, 1)
    rec["rss_after_partition_gb"] = round(rss_gb(), 2)
    rec["vp"] = int(sharded.vp)
    rec["ep"] = int(sharded.ep)
    rec["max_h"] = int(sharded.max_h)
    cut_edges = sum(int(s.num_edges - s.num_int) for s in sharded.shards)
    rec["edge_cut"] = round(cut_edges / max(1, g.num_edges), 4)
    print(f"partitioned {n}-way in {rec['phases']['partition_s']}s "
          f"cut={rec['edge_cut']} max_h={sharded.max_h} "
          f"rss={rec['rss_after_partition_gb']}GB", flush=True)

    # Free the global graph arrays the later phases don't need (the
    # shards hold their own padded copies) — at 1B edges these are tens
    # of GB the plan build would otherwise have to share RAM with.
    feats_shape = g.features.shape
    g.features = np.zeros((1, 1), np.float32)
    g.src = g.dst = g.edge_norm = g.in_degree = g.labels = None
    import gc

    gc.collect()

    t0 = time.perf_counter()
    rg = build_ragged_plan(sharded)
    rec["phases"]["ragged_plan_s"] = round(time.perf_counter() - t0, 1)
    rec["ragged_rows_on_wire"] = int(rg["send_sz"].sum())
    print(f"ragged plan in {rec['phases']['ragged_plan_s']}s "
          f"({rec['ragged_rows_on_wire']} exact rows/exchange)", flush=True)

    # The fused plan build reads only (src, dst, edge_val, num_edges);
    # free the interior/boundary split copies and dense per-shard
    # features first (~25 GB at this scale).
    for s in sharded.shards:
        s.src_int = s.dst_int = s.val_int = None
        s.src_bnd = s.dst_bnd = s.val_bnd = None
        s.x = s.onehot = None
    import gc

    gc.collect()

    t0 = time.perf_counter()
    from dorylus_tpu.ops.hyb_sharded import ShardedHybSpMM
    op = ShardedHybSpMM(sharded, static_vals=True, edges="fused",
                        dynamic=False, gather_dtype=None)
    rec["phases"]["hyb_fused_plan_s"] = round(time.perf_counter() - t0, 1)
    rec["rss_peak_gb"] = round(rss_gb(), 2)
    rec["plan_padded_gb"] = round(
        padded_nbytes(op.arrays) / 2**30, 2)
    rec["n_pure_buckets"] = int(op.n_pure)
    rec["feature_shape"] = list(feats_shape)
    rec["note"] = (
        "Host-side pipeline at the reference's 32-server Friendster width "
        "(run-friendster-gcn:6): range partition, exact-wire ragged halo "
        "plan, and the full fused-overlap hyb kernel plans for all "
        f"{n} shards, built in one process on a 4-core host. The plans "
        "are the SAME objects ShardedEngine ships to a pod; only device "
        "placement is absent here (no 32-chip mesh on this box).")
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "partition_1b_r5.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1), flush=True)


def train_300m(args) -> None:
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.engine import Engine
    from dorylus_tpu.parallel import ShardedEngine, make_mesh

    rec = {"requested_edges": int(args.edges), "phases": {}}
    t0 = time.perf_counter()
    g = gen_graph(args.edges, args.degree, args.feature_dim, 16)
    rec["phases"]["generate_s"] = round(time.perf_counter() - t0, 1)
    rec["vertices"] = int(g.num_vertices)
    rec["edges"] = int(g.num_edges)
    print(f"generated V={g.num_vertices} E={g.num_edges}", flush=True)

    layers = LayerConfig([args.feature_dim, 32, 16])
    kw = dict(epochs=args.epochs, eval_every=0, kernel="hyb",
              agg_dtype="bfloat16", reuse="off")

    t0 = time.perf_counter()
    eng = ShardedEngine(g, layers, TrainConfig(**kw), mesh=make_mesh(8))
    rec["phases"]["sharded_engine_build_s"] = round(
        time.perf_counter() - t0, 1)
    rec["overlap_fused"] = bool(getattr(eng.model.spmm_split, "fused",
                                        False))
    t0 = time.perf_counter()
    rep = eng.run()
    rec["phases"]["sharded_train_s"] = round(time.perf_counter() - t0, 1)
    rec["sharded_losses"] = [round(e.loss, 6) for e in rep.epochs]
    rec["sharded_epoch_ms"] = [round(e.time_ms, 1) for e in rep.epochs]
    rec["rss_after_sharded_gb"] = round(rss_gb(), 2)
    print("sharded losses:", rec["sharded_losses"], flush=True)

    # Single-device loss-parity spot check (same graph, same config).
    t0 = time.perf_counter()
    eng1 = Engine(g, layers, TrainConfig(**kw))
    rep1 = eng1.run()
    rec["phases"]["single_train_s"] = round(time.perf_counter() - t0, 1)
    rec["single_losses"] = [round(e.loss, 6) for e in rep1.epochs]
    delta = max(abs(a - b) for a, b in
                zip(rec["sharded_losses"], rec["single_losses"]))
    rec["max_loss_delta"] = round(delta, 8)
    rec["rss_peak_gb"] = round(rss_gb(), 2)
    rec["note"] = (
        "8-way virtual-CPU-mesh training at 3x the round-4 demonstrated "
        "scale (sharded_100m_r4.json), with the fused overlap plan and "
        "bf16 gather tables; loss parity vs one device bounds the "
        "sharded transport (halo + psum) numerics. Wall times are a "
        "4-core host timesharing 8 virtual devices — correctness "
        "evidence, not throughput.")
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "sharded_300m_r5.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1), flush=True)
    assert delta < 2e-3, f"loss parity broke: {delta}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["partition-1b", "train-300m"])
    ap.add_argument("--edges", type=float, default=None)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--feature-dim", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()
    if args.cmd == "partition-1b":
        args.edges = args.edges or 1.02e9
        partition_1b(args)
    else:
        args.edges = args.edges or 3.0e8
        args.feature_dim = max(args.feature_dim, 16)
        train_300m(args)


if __name__ == "__main__":
    main()
