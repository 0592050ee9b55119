"""hyb vs degree across V at the production chunk threshold (8 GB).

Round-3 history: the first crossover sweep ran with the old 4 GB
_MSGS_CHUNK_BYTES and showed a fake large-V hyb collapse (V=1.6M:
613 ms chunked vs 210 ms unchunked). This probe re-measures the curve
at the production threshold and prints each plan's bucket structure
(widths, rows, chunked-or-not) so regime changes are attributable.

Writes benchmarks/results/kernel_crossover_r3.json (overwrites the
superseded 4 GB-threshold rows).
"""

import json
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import dorylus_tpu.ops.hyb_spmm as H  # noqa: E402
from probe_largev_sharded import rate_degree, rate_hyb, timeit  # noqa: E402
from dorylus_tpu.graph.graph import clustered_synthetic_graph  # noqa: E402


def bucket_report(src, dst, V, F=128):
    op = H.HybSpMM(src, dst, V, V, gather_dtype=jnp.bfloat16,
                   feature_dim=F, static_val=np.full(len(src), 1e-3,
                                                     np.float32))
    rep = []
    for b in op.arrays["fwd"]["buckets"]:
        nb, w = b["rows"].shape
        bytes_ = nb * w * max(F, 128) * 2
        rep.append({"w": int(w), "rows": int(nb),
                    "msgs_gb": round(bytes_ / 2**30, 2),
                    "chunked": bool(bytes_ > H._MSGS_CHUNK_BYTES)})
    top = op.arrays["fwd"]["top"]
    if top is not None:
        nb, w = top["rows"].shape
        rep.append({"w": int(w), "rows": int(nb), "top": True,
                    "msgs_gb": round(nb * w * max(F, 128) * 2 / 2**30, 2),
                    "chunked": bool(nb * w * max(F, 128) * 2
                                    > H._MSGS_CHUNK_BYTES)})
    del op
    return rep


def main():
    res = {"platform": jax.devices()[0].platform,
           "chunk_threshold_gb": H._MSGS_CHUNK_BYTES / 2**30}
    for V in (400_000, 800_000, 1_200_000, 1_600_000):
        g = clustered_synthetic_graph(V, 15, 16, 8, seed=7, window=8192,
                                      cut=0.1)
        E = g.num_edges
        row = {"E": E, "buckets": bucket_report(g.src, g.dst, V)}
        for name, fn in (("hyb", rate_hyb), ("degree", rate_degree)):
            eps, dt = fn(g.src, g.dst, V, V, E, V)
            row[name] = {"edges_per_s": round(eps, 1),
                         "ms": round(dt * 1e3, 2)}
            print(f"V={V} {name}: {dt*1e3:.1f} ms  {eps/1e6:.1f} M edges/s",
                  flush=True)
        print(f"  buckets: {row['buckets']}", flush=True)
        res[str(V)] = row
    out = (Path(__file__).resolve().parent.parent
           / "benchmarks/results/kernel_crossover_r3.json")
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
