"""Weak-scaling harness: edges/s at 1..N shards (BASELINE.md north-star:
>=70% weak-scaling efficiency in edges/s across hosts).

On a single-chip dev box this runs on the virtual CPU mesh (set
XLA_FLAGS=--xla_force_host_platform_device_count=8); on a pod slice it
exercises real ICI/DCN. Weak scaling: the graph grows with the shard count
so per-shard work is constant.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
                    choices=["xla", "pallas", "degree"],
                    help="aggregation kernel (see TrainConfig.kernel)")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.graph.graph import synthetic_graph
    from dorylus_tpu.parallel.mesh import make_mesh
    from dorylus_tpu.parallel.train_step import ShardedEngine

    results = []
    base_eps = None
    for n in args.shards:
        if n > len(jax.devices()):
            print(f"# skipping {n} shards (only {len(jax.devices())} devices)")
            continue
        g = synthetic_graph(args.base_vertices * n, args.degree,
                            args.feature_dim, args.classes, seed=123)
        layers = LayerConfig([args.feature_dim, 32, args.classes])
        cfg = TrainConfig(epochs=args.epochs, eval_every=0,
                          kernel=args.kernel)
        eng = ShardedEngine(g, layers, cfg, mesh=make_mesh(n))
        rep = eng.run()
        # Skip epoch 0 (compile); per-epoch edges processed = |E| per
        # direction per layer — report raw edges/s over fwd SpMM edges.
        epoch_s = np.mean([e.time_ms for e in rep.epochs[1:]]) / 1e3
        eps = g.num_edges / epoch_s
        if base_eps is None:
            base_eps = eps
        eff = eps / (base_eps * n / args.shards[0])
        results.append({
            "shards": n, "vertices": g.num_vertices, "edges": g.num_edges,
            "epoch_ms": round(epoch_s * 1e3, 2),
            "edges_per_s": round(eps, 1),
            "weak_scaling_efficiency": round(eff, 3),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"weak_scaling": results}))


if __name__ == "__main__":
    main()
