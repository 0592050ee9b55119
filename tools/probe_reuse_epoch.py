"""Does the pair-reuse op win carry into FULL training epochs? (r4 rerun)

Round-3 HISTORY: this probe measured 0.78x (reuse LOSING at the step
level, reuse_epoch_r3.json) BEFORE the regime-aware aggregation
ordering (df5/65e) landed; with it, reuse wins at the step level too
(probe_reuse_step.py bisect: 1.50x at epochs_per_call 1 AND 3).

tools/probe_reuse_largev.py measured the forward mask pass 1.63-1.88x
at V=1.6M. A training epoch adds the backward (served by the
independently-mined transposed rewrite, ops/reuse_spmm.py _bwd) and the
dense layers; this probe times warm GCN and GAT epochs with/without
--reuse pairs on the same community-core graph, through the production
Engine path (custom VJP included). Writes
benchmarks/results/reuse_epoch_r4.json.
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

V, DEG, F = 1_600_000, 15, 128


def build_graph():
    src, dst = community_core_edges(V, DEG, comm=400, core=60, p_core=0.85,
                                    seed=0)
    rng = np.random.default_rng(1)
    labels = ((np.arange(V) * 32) // V).astype(np.int32)
    feats = rng.normal(0, 0.3, size=(V, F)).astype(np.float32)
    g = Graph(num_vertices=V, src=src, dst=dst, features=feats,
              labels=labels, num_classes=32)
    return g.finalize()


def epoch_ms(g, model, reuse, epochs=3):
    cfg = TrainConfig(model=model, epochs=epochs, eval_every=0,
                      kernel="hyb", agg_dtype="bfloat16",
                      learning_rate=0.005 if model == "gat" else 0.01,
                      epochs_per_call=epochs, reuse=reuse, reuse_passes=2)
    t0 = time.perf_counter()
    eng = Engine(g, LayerConfig([F, 128, 32]), cfg)
    init_s = time.perf_counter() - t0
    eng.run(epochs)  # compile
    rep = eng.run(epochs)  # warm
    ms = float(np.mean([e.time_ms for e in rep.epochs[-epochs:]]))
    loss = float(rep.epochs[-1].loss)
    print(f"{model} reuse={reuse}: {ms:9.1f} ms/epoch  "
          f"(init {init_s:.0f}s, final loss {loss:.4f})", flush=True)
    return ms, loss, init_s


def main():
    g = build_graph()
    print(f"community graph: V={V} E={g.num_edges}", flush=True)
    out = {"V": V, "E": int(g.num_edges), "F": F,
           "config": [F, 128, 32], "agg": "bf16", "passes": 2}
    for model in ("gcn", "gat"):
        ms0, loss0, _ = epoch_ms(g, model, "off")
        ms1, loss1, init_s = epoch_ms(g, model, "pairs")
        out[model] = {"plain_epoch_ms": round(ms0, 1),
                      "reuse_epoch_ms": round(ms1, 1),
                      "speedup": round(ms0 / ms1, 3),
                      "plain_loss": round(loss0, 4),
                      "reuse_loss": round(loss1, 4),
                      "reuse_init_s": round(init_s, 1)}
    path = Path(__file__).resolve().parent.parent / \
        "benchmarks/results/reuse_epoch_r4.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
