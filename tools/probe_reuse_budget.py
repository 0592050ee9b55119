"""Reddit-scale pair-budget sweep (round-3 verdict #2).

At Reddit scale the UNCAPPED rewrite loses (reuse_r3.json: appended pair
rows push the 59.6 MB bf16 table over the ~64 MB gather regime cliff and
the regime loss eats the 35% row win). The engine's auto budget
(resolve_reuse_budget) caps pairs so a below-cliff table stays below the
cliff; this sweep measures warm GCN epochs across budgets — off, auto,
intermediate, unlimited — so the auto policy (and the cliff model behind
it) rests on a committed artifact instead of extrapolation.

Writes benchmarks/results/reuse_budget_r4.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.common.config import LayerConfig, TrainConfig  # noqa: E402
from dorylus_tpu.engine.engine import Engine  # noqa: E402
from dorylus_tpu.graph.graph import Graph, community_core_edges  # noqa: E402
from dorylus_tpu.ops.reuse_spmm import ReuseSpMM  # noqa: E402

V, DEG, F = 232_965, 50, 602  # Reddit shape (run/reddit.config)


def build_graph():
    src, dst = community_core_edges(V, DEG, comm=400, core=60, p_core=0.85,
                                    seed=0)
    rng = np.random.default_rng(1)
    labels = ((np.arange(V) * 41) // V).astype(np.int32)
    feats = rng.normal(0, 0.3, size=(V, F)).astype(np.float32)
    return Graph(num_vertices=V, src=src, dst=dst, features=feats,
                 labels=labels, num_classes=41).finalize()


def run(g, reuse, budget, epochs=3):
    cfg = TrainConfig(model="gcn", epochs=epochs, eval_every=0,
                      kernel="hyb", agg_dtype="bfloat16",
                      epochs_per_call=epochs, reuse=reuse,
                      reuse_max_pairs=budget)
    eng = Engine(g, LayerConfig([F, 128, 41]), cfg)
    eng.run(epochs)  # compile
    rep = eng.run(epochs)  # warm
    ms = float(np.mean([e.time_ms for e in rep.epochs[-epochs:]]))
    rec = {"reuse": reuse, "budget": budget, "epoch_ms": round(ms, 1),
           "loss": round(float(rep.epochs[-1].loss), 4)}
    op = eng.model.spmm_op
    if isinstance(op, ReuseSpMM):
        rec["pairs"] = int(op.plan_fwd.num_pairs)
        rec["rows_after"] = int(op.plan_fwd.stats["rows_after"])
        rec["table_mb"] = round(
            (V + op.plan_fwd.num_pairs) * 128 * 2 / 2**20, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    g = build_graph()
    print(f"Reddit-shaped community graph: V={V} E={g.num_edges}",
          flush=True)
    rows = [run(g, "off", 0)]
    for budget in (-1, 60_000, 120_000, 0):  # auto, mid, over-cliff, unltd
        rows.append(run(g, "pairs", budget))
    base = rows[0]["epoch_ms"]
    for r in rows[1:]:
        r["speedup_vs_off"] = round(base / r["epoch_ms"], 3)
    out = {"V": V, "E": int(g.num_edges), "config": [F, 128, 41],
           "agg": "bf16", "base_table_mb": round(V * 128 * 2 / 2**20, 1),
           "sweep": rows}
    path = Path(__file__).resolve().parent.parent / \
        "benchmarks/results/reuse_budget_r4.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
