"""Measure the GAT hyb cold compile (round-3 verdict Weak #3: ~14 min at
Reddit scale) — split into trace+lower (host jax) vs backend compile
(remote XLA:TPU through the tunnel), per kernel and scan length, with
the persistent compile cache OFF so every number is a true cold compile.

Usage: python tools/probe_gat_cold.py [--kernel hyb] [--scan-k 10]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ["DORYLUS_COMPILE_CACHE"] = "off"

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gat")
    ap.add_argument("--kernels", nargs="+", default=["hyb"])
    ap.add_argument("--scan-ks", type=int, nargs="+", default=[10])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--lam-slots", type=int, default=0,
                    help="override hyb bucket DP lambda (0 = default)")
    ap.add_argument("--variant", default="none,False",
                help="eval_mode,with_history e.g. mixed,True")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_graph
    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.engine.engine import Engine

    v = int(232965 * args.scale)
    g = build_graph(v, 50, 602, 41, seed=0)
    layers = LayerConfig([602, 128, 41])
    print(f"V={g.num_vertices} E={g.num_edges} platform="
          f"{jax.devices()[0].platform}", flush=True)

    if args.lam_slots:
        import dorylus_tpu.ops.hyb_spmm as hmod
        hmod._LAMBDA_SLOTS = args.lam_slots

    rows = []
    for kernel in args.kernels:
        for k in args.scan_ks:
            cfg = TrainConfig(model=args.model, kernel=kernel,
                              agg_dtype="bfloat16", epochs=k,
                              eval_every=0, epochs_per_call=k,
                              compile_cache="off")
            t0 = time.perf_counter()
            eng = Engine(g, layers, cfg)
            t_build = time.perf_counter() - t0
            multis, _ = eng._make_step()
            emode, hist = args.variant.split(",")
            hist = hist == "True"
            fn = multis[(emode, hist)]
            lrs = jnp.full((k,), 0.01, jnp.float32)
            flags = jnp.zeros((k,), bool)
            t0 = time.perf_counter()
            import jax as _jax
            history = (_jax.tree.map(lambda x: x[None], eng.params)
                       if hist else None)
            lowered = fn.lower(eng.params, eng.opt_state, history,
                               eng.batch, lrs, flags)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            compiled = lowered.compile()
            t_compile = time.perf_counter() - t0
            rec = {"model": args.model, "kernel": kernel, "scan_k": k,
                   "variant": args.variant,
                   "plan_build_s": round(t_build, 1),
                   "trace_lower_s": round(t_lower, 1),
                   "backend_compile_s": round(t_compile, 1),
                   "lam_slots": args.lam_slots or None}
            # One dispatch so the compile is known-runnable.
            out = compiled(eng.params, eng.opt_state, history, eng.batch,
                           lrs, flags)
            rec["first_losses_ok"] = bool(np.isfinite(
                np.asarray(out[3])).all())
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1) + "\n")


if __name__ == "__main__":
    main()
