"""Bisect the pair-reuse step-level inversion (round-4).

probe_reuse_vjp.py (r4 run): op-level fwd AND grad WIN at V=1.6M
(fwd 1.81x, grad 1.39x, both models). probe_reuse_epoch.py (r3): full
engine epochs LOSE 0.78x. The remaining deltas between those two
measurements are (a) the two-layer model chain (traced intermediate
tables, dense matmuls, loss) and (b) the lax.scan epoch-group context
(CLAUDE.md: many small kernels schedule poorly in nested HLO
computations — and the reuse build adds levels of small gathers+concats).

This probe times warm epochs through the production Engine at
epochs_per_call=1 (per-epoch dispatch, no scan) and =3 (scanned group)
for plain hyb vs reuse, GCN, V=1.6M community-core graph.
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


def epoch_ms(g, reuse, epc, epochs=3, model="gcn", passes=2):
    cfg = TrainConfig(model=model, epochs=epochs, eval_every=0,
                      kernel="hyb", agg_dtype="bfloat16",
                      learning_rate=0.01, epochs_per_call=epc,
                      reuse=reuse, reuse_passes=passes)
    eng = Engine(g, LayerConfig([F, 128, 32]), cfg)
    eng.run(epochs)  # compile
    rep = eng.run(epochs)  # warm
    ms = float(np.mean([e.time_ms for e in rep.epochs[-epochs:]]))
    print(f"{model} reuse={reuse:5s} epochs_per_call={epc}: "
          f"{ms:9.1f} ms/epoch  loss {rep.epochs[-1].loss:.4f}", flush=True)
    return ms


def main():
    g = build_graph()
    print(f"V={V} E={g.num_edges}", flush=True)
    out = {"V": V, "E": int(g.num_edges)}
    for epc in (1, 3):
        p = epoch_ms(g, "off", epc)
        r = epoch_ms(g, "pairs", epc)
        out[f"epc{epc}"] = {"plain_ms": round(p, 1), "reuse_ms": round(r, 1),
                            "speedup": round(p / r, 3)}
    print(json.dumps(out))
    path = Path(__file__).resolve().parent.parent / \
        "benchmarks/results/reuse_step_bisect_r4.json"
    path.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
