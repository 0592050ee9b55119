"""Weak-scaling harness: edges/s at 1..N shards (BASELINE.md north-star:
>=70% weak-scaling efficiency in edges/s across hosts).

On a pod slice this exercises real ICI/DCN. On a single-chip dev box it runs
on the virtual CPU mesh — where two artifacts poison naive numbers:
  1. All virtual devices timeshare the host's cores, so the 1-shard
     baseline gets every core while N shards fight for them. `--pin`
     fixes this by re-running each shard count under `taskset` with one
     core per shard (a real weak-scaling measurement of the SPMD program,
     up to the host's core count).
  2. A uniform-random graph has edge-cut (n-1)/n — no partitioner can do
     better, and the reference's whole METIS tier (inputs/partitioner.cpp)
     exists because real graphs are NOT like that. `--graph clustered`
     (default) uses a locality-structured graph with a configurable cut,
     the shape a METIS-partitioned Reddit/Amazon presents to the range
     partitioner.

Weak scaling: the graph grows with the shard count so per-shard work is
constant; efficiency(n) = edges_per_s(n) / (n * edges_per_s(1)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_once(args, n: int) -> dict:
    import jax

    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.graph.graph import clustered_synthetic_graph, synthetic_graph
    from dorylus_tpu.parallel.mesh import make_mesh
    from dorylus_tpu.parallel.train_step import ShardedEngine

    if args.graph == "clustered":
        g = clustered_synthetic_graph(
            args.base_vertices * n, args.degree, args.feature_dim,
            args.classes, seed=123, window=max(64, args.base_vertices // 8),
            cut=args.cut)
    else:
        g = synthetic_graph(args.base_vertices * n, args.degree,
                            args.feature_dim, args.classes, seed=123)
    layers = LayerConfig([args.feature_dim, 32, args.classes])
    cfg = TrainConfig(epochs=args.epochs, eval_every=0, kernel=args.kernel)
    eng = ShardedEngine(g, layers, cfg, mesh=make_mesh(n))
    eng.run()  # warmup: compiles every epoch-group shape
    rep = eng.run()  # measured run, warm caches
    # Per-epoch edges processed = |E| per direction per layer — report raw
    # edges/s over fwd SpMM edges.
    epoch_s = np.mean([e.time_ms for e in rep.epochs[-args.epochs:]]) / 1e3
    return {
        "shards": n, "vertices": g.num_vertices, "edges": g.num_edges,
        "epoch_ms": round(epoch_s * 1e3, 2),
        "edges_per_s": round(g.num_edges / epoch_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-vertices", type=int, default=8192)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--feature-dim", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--kernel", default="xla",
                    choices=["xla", "degree", "hyb"],
                    help="aggregation kernel (see TrainConfig.kernel)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="median-of-N runs per shard count (pinned mode)")
    ap.add_argument("--graph", default="clustered",
                    choices=["clustered", "random"],
                    help="clustered = METIS-partitioned-real-graph analog")
    ap.add_argument("--cut", type=float, default=0.1,
                    help="cross-window edge fraction for --graph clustered")
    ap.add_argument("--pin", action="store_true",
                    help="re-run each shard count under taskset with one "
                         "host core per shard (honest CPU weak scaling; "
                         "caps shard counts at the core count)")
    ap.add_argument("--out", default=None, help="write result JSON here")
    ap.add_argument("--_child", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.pin and args._child is None:
        ncores = os.cpu_count() or 1
        results = []
        for n in args.shards:
            if n > ncores:
                print(f"# skipping {n} shards (only {ncores} cores to pin)")
                continue
            cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0",
                   sys.executable, __file__, "--_child", str(n),
                   "--cpu", "--kernel", args.kernel, "--graph", args.graph,
                   "--cut", str(args.cut), "--epochs", str(args.epochs),
                   "--base-vertices", str(args.base_vertices),
                   "--degree", str(args.degree),
                   "--feature-dim", str(args.feature_dim),
                   "--classes", str(args.classes)]
            recs = []
            for _ in range(max(1, args.repeats)):
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     check=True).stdout
                recs.append(json.loads(out.strip().splitlines()[-1]))
            rec = sorted(recs, key=lambda r: r["edges_per_s"])[len(recs) // 2]
            if args.repeats > 1:
                rec["edges_per_s_runs"] = [r["edges_per_s"] for r in recs]
                # Multi-tenant host CPU varies up to 2x run-to-run
                # (benchmarks/results/partition_100m_r3.json note); best-of-N
                # measures the machine's capacity at each shard count and is
                # the stable basis for an efficiency ratio.
                rec["edges_per_s_best"] = max(r["edges_per_s"] for r in recs)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        base = results[0]
        for r in results:
            r["weak_scaling_efficiency"] = round(
                r["edges_per_s"] / (base["edges_per_s"] * r["shards"]
                                    / base["shards"]), 3)
            if "edges_per_s_best" in r:
                r["weak_scaling_efficiency_best"] = round(
                    r["edges_per_s_best"] / (base["edges_per_s_best"]
                                             * r["shards"] / base["shards"]),
                    3)
        summary = {"weak_scaling": results, "mode": "pinned-cpu",
                   "graph": args.graph, "cut": args.cut,
                   "kernel": args.kernel, "cores": ncores}
        print(json.dumps(summary))
        if args.out:
            Path(args.out).write_text(json.dumps(summary, indent=1))
        return

    if args.cpu:
        n_dev = args._child or max(args.shards)
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={n_dev}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args._child is not None:
        print(json.dumps(run_once(args, args._child)), flush=True)
        return

    results = []
    base_eps = None
    for n in args.shards:
        if n > len(jax.devices()):
            print(f"# skipping {n} shards (only {len(jax.devices())} devices)")
            continue
        rec = run_once(args, n)
        if base_eps is None:
            base_eps = rec["edges_per_s"] / n
        rec["weak_scaling_efficiency"] = round(
            rec["edges_per_s"] / (base_eps * n), 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    summary = {"weak_scaling": results, "mode": "shared-cpu" if args.cpu else "device",
               "graph": args.graph, "cut": args.cut, "kernel": args.kernel}
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
