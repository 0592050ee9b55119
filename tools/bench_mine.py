"""Pair-mining throughput at production scale (round-3 verdict #3:
"mining >=100 M edges in under a minute").

Generates a community-core graph (the overlap-heavy real-social-graph
shape reuse targets) at the requested edge count and times mine_reuse —
the native miner (native/graphcore.cpp gc_mine_pairs) vs the numpy
fallback — writing benchmarks/results/mine_<E>_r4.json. Host-only (the
miner is a preprocessing stage, the reference analog being the native
single-stream dataloader, dataloader.cpp:225-330).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=5_000_000)
    ap.add_argument("--degree", type=int, default=20)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--numpy-also", action="store_true",
                    help="also time the pure-numpy fallback (slow)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from dorylus_tpu.graph.graph import community_core_edges
    from dorylus_tpu.graph.reuse import mine_reuse
    from dorylus_tpu import native

    t0 = time.perf_counter()
    src, dst = community_core_edges(args.vertices, args.degree,
                                    comm=1000, core=60, seed=7)
    gen_s = time.perf_counter() - t0
    e = len(src)
    print(f"graph: {args.vertices} vertices, {e} edges ({gen_s:.1f}s gen)")

    assert native.has_mine_pairs(), "native miner required for this bench"
    t0 = time.perf_counter()
    plan = mine_reuse(src, dst, args.vertices, min_uses=3,
                      passes=args.passes)
    native_s = time.perf_counter() - t0
    rec = {
        "edges": int(e), "vertices": args.vertices,
        "passes": args.passes,
        "native_mine_s": round(native_s, 2),
        "native_edges_per_s": round(e / native_s, 0),
        "pairs": int(plan.num_pairs),
        "row_reduction": round(plan.stats["row_reduction"], 4),
    }
    print(json.dumps(rec))

    if args.numpy_also:
        from dorylus_tpu.graph import reuse as reuse_mod
        t0 = time.perf_counter()
        pairs, s2, d2, st = reuse_mod._mine_one(src, dst, args.vertices,
                                                3, 0)
        rec["numpy_one_pass_s"] = round(time.perf_counter() - t0, 2)
        rec["native_speedup"] = round(rec["numpy_one_pass_s"] / native_s, 1)
        assert len(pairs) == len(plan.levels[0])
        print(json.dumps({k: rec[k] for k in ("numpy_one_pass_s",
                                              "native_speedup")}))

    if args.out:
        Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
