"""Bucket-count lambda sweep on the headline shape (round 5).

ceiling_r5.json decomposed the hyb kernel's gap to its gather bound as
n_parts x ~1.37 ms kernel startup. The width-DP's lambda (_LAMBDA_SLOTS,
512k slot-equivalents per extra bucket) encodes a startup cost of
512k / 430M rows/s ~ 1.2 ms — close to measured, but worth validating
end-to-end: sweep lambda, rebuild the plan, time the production pass.

Writes benchmarks/results/lambda_sweep_r5.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.common.cache import enable_compile_cache  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    enable_compile_cache()
    from bench import build_graph, time_loop
    from dorylus_tpu.graph.reorder import apply_order, degree_order
    from dorylus_tpu.ops.hyb_spmm import HybSpMM, spmm_hyb

    on_tpu = jax.devices()[0].platform != "cpu"
    V = 232_965 if on_tpu else 23_296
    DEG = 50 if on_tpu else 20
    F = 128
    iters = 10 if on_tpu else 3

    g = build_graph(V, DEG, 602, 41, seed=1)
    g = apply_order(g, degree_order(g, ascending=True))
    h = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 1, size=(V, F)).astype(np.float32))

    rows = []
    for lam in (128 * 1024, 256 * 1024, 512 * 1024, 1024 * 1024,
                2048 * 1024, 4096 * 1024):
        op = HybSpMM(np.asarray(g.src), np.asarray(g.dst), V, V,
                     gather_dtype=jnp.bfloat16, feature_dim=F,
                     static_val=np.asarray(g.edge_norm), lam_slots=lam)
        n_iso = op.static[4]
        fwd = op.arrays["fwd"]
        n_parts = len(fwd["buckets"]) + (1 if fwd["top"] is not None
                                         else 0)
        slots = sum(int(np.prod(b["rows"].shape)) for b in fwd["buckets"])
        if fwd["top"] is not None:
            slots += int(np.prod(fwd["top"]["rows"].shape))

        def agg(h, fwd, gd=jnp.bfloat16, n_iso=n_iso):
            return spmm_hyb(h, fwd, V, gather_dtype=gd, n_iso=n_iso)

        dts = sorted(time_loop(agg, h, fwd, iters=iters) for _ in range(3))
        dt = dts[1]
        rows.append({"lam_slots": lam, "n_parts": n_parts,
                     "slots": slots, "ms": round(dt * 1e3, 3),
                     "edges_per_s": round(g.num_edges / dt / 1e6, 1)})
        print(rows[-1], flush=True)
        del op

    best = min(rows, key=lambda r: r["ms"])
    rec = {"shape": {"V": V, "E": int(g.num_edges), "F": F},
           "sweep": rows, "best": best,
           "note": ("Production headline pass vs the width-DP's "
                    "per-bucket cost lambda. ceiling_r5.json measured "
                    "~1.37 ms/part startup ~ 590k slot-equivalents at "
                    "the 430M rows/s gather rate; this validates the "
                    "512k default end-to-end on the Reddit shape.")}
    out = Path(__file__).resolve().parent.parent / "benchmarks" / "results"
    (out / "lambda_sweep_r5.json").write_text(json.dumps(rec, indent=1))
    print("best:", best, flush=True)


if __name__ == "__main__":
    main()
