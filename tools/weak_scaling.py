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

Round-4 methodology (addresses the r3 verdict's 0.449-at-2-shards
artifact): repeats run IN-PROCESS on a warm engine (median-of-N over
epoch groups — process-launch variance is not the quantity of interest),
per-shard graphs sized so an epoch >= 500 ms (OS jitter amortizes; r3
used 15-60 ms epochs), `--overlap both` measures overlap-on vs
overlap-off on the same partition, `--decompose` attaches the per-stage
bracket (halo vs aggregate vs grad — engine/profiling.py), and the halo
traffic is reported as BYTES with the padding waste quantified (verdict
Weak #4: parallel/halo.py pads to the pair max)."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _halo_traffic(sharded, layers, model: str) -> dict:
    """Per-epoch halo bytes: padded (what the fixed-shape all_to_all
    ships) vs needed (distinct ghost rows each shard actually
    references), fwd + bwd (the collective's VJP is another all_to_all
    of the same shape). Widths follow the models' exchange widths (GCN
    transforms first when shrinking; GAT exchanges z at the out width)."""
    n, vp, mh = sharded.n_shards, sharded.vp, sharded.max_h
    needed = 0
    for s in sharded.shards:
        src = np.asarray(s.src[: s.num_edges])
        gsrc = src[src >= vp] - vp
        blocks = gsrc // mh
        for q in range(n):
            needed += len(np.unique(gsrc[blocks == q]))
    sent_rows = n * (n - 1) * mh  # per exchange, excluding self blocks
    dims = layers.dims
    widths = [dims[l + 1] if model == "gat" else min(dims[l], dims[l + 1])
              for l in range(len(dims) - 1)]
    per_row = sum(widths) * 4 * 2  # all layers, fwd + bwd, f32
    return {
        "max_h": mh,
        "ghost_rows_needed": int(needed),
        "ghost_rows_sent_per_exchange": int(sent_rows),
        "padding_waste": round(1 - needed / max(1, sent_rows), 3),
        "halo_bytes_per_epoch_sent": int(sent_rows * per_row),
        "halo_bytes_per_epoch_needed": int(needed * per_row),
    }


def _measure(eng, edges: int, epochs: int, repeats: int) -> dict:
    eng.run()  # warmup: compiles every epoch-group shape
    runs = []
    for _ in range(max(1, repeats)):
        rep = eng.run()
        epoch_s = np.mean([e.time_ms for e in rep.epochs[-epochs:]]) / 1e3
        runs.append(round(edges / epoch_s, 1))
    runs.sort()
    return {
        "edges_per_s": runs[len(runs) // 2],
        "epoch_ms": round(edges / runs[len(runs) // 2] * 1e3, 2),
        "edges_per_s_runs": runs,
    }


def run_once(args, n: int) -> dict:
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
    mesh = make_mesh(n)
    overlap_first = args.overlap != "off"
    # reuse pinned off: this harness measures the SCALING of one fixed
    # kernel; auto-reuse swapping the op between shard counts would muddy
    # the efficiency ratio (reuse has its own artifacts, reuse_*_r4.json).
    cfg = TrainConfig(epochs=args.epochs, eval_every=0, kernel=args.kernel,
                      model=args.model, overlap=overlap_first, reuse="off")
    eng = ShardedEngine(g, layers, cfg, mesh=mesh)
    rec = {"shards": n, "vertices": g.num_vertices, "edges": g.num_edges,
           "overlap": overlap_first}
    rec.update(_measure(eng, g.num_edges, args.epochs, args.repeats))
    if n > 1 and args.overlap == "both":
        import dataclasses
        eng2 = ShardedEngine(g, layers,
                             dataclasses.replace(cfg, overlap=False),
                             mesh=mesh)
        rec["serial"] = _measure(eng2, g.num_edges, args.epochs,
                                 args.repeats)
        rec["overlap_speedup"] = round(
            rec["edges_per_s"] / rec["serial"]["edges_per_s"], 3)
    if args.decompose:
        rec["stages_ms"] = {k: round(v, 2)
                            for k, v in eng.profile(iters=3).items()}
    if n > 1:
        rec["halo"] = _halo_traffic(eng.sharded, layers, args.model)
    return rec


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
    ap.add_argument("--model", default="gcn", choices=["gcn", "gat"])
    ap.add_argument("--repeats", type=int, default=1,
                    help="median-of-N measured runs on the warm engine")
    ap.add_argument("--graph", default="clustered",
                    choices=["clustered", "random"],
                    help="clustered = METIS-partitioned-real-graph analog")
    ap.add_argument("--cut", type=float, default=0.1,
                    help="cross-window edge fraction for --graph clustered")
    ap.add_argument("--overlap", default="on", choices=["on", "off", "both"],
                    help="interior/boundary halo overlap; 'both' also "
                         "measures the serial path on the same partition")
    ap.add_argument("--decompose", action="store_true",
                    help="attach the per-stage bracket (halo/aggregate/"
                         "fwd/grad) from engine/profiling.py")
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
                   "--model", args.model, "--overlap", args.overlap,
                   "--cut", str(args.cut), "--epochs", str(args.epochs),
                   "--repeats", str(args.repeats),
                   "--base-vertices", str(args.base_vertices),
                   "--degree", str(args.degree),
                   "--feature-dim", str(args.feature_dim),
                   "--classes", str(args.classes)] \
                  + (["--decompose"] if args.decompose else [])
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True).stdout
            rec = json.loads(out.strip().splitlines()[-1])
            results.append(rec)
            print(json.dumps(rec), flush=True)
        base = results[0]
        for r in results:
            r["weak_scaling_efficiency"] = round(
                r["edges_per_s"] / (base["edges_per_s"] * r["shards"]
                                    / base["shards"]), 3)
        summary = {"weak_scaling": results, "mode": "pinned-cpu",
                   "graph": args.graph, "cut": args.cut,
                   "kernel": args.kernel, "model": args.model,
                   "cores": ncores, "repeats": args.repeats}
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
               "graph": args.graph, "cut": args.cut, "kernel": args.kernel,
               "model": args.model}
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
