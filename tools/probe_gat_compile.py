"""Diagnose the Reddit-scale GAT compile blowup (round-1: the degree-kernel
GAT train step did not finish compiling in 35 min through the tunnel).

Times trace / lower / compile separately, per kernel, on the CPU backend
(local XLA — no tunnel in the way), at reduced and full Reddit scale, so we
can see WHERE the time goes and how it scales.

Usage: python tools/probe_gat_compile.py [--scale 0.1] [--kernel degree]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dorylus_tpu.common.config import LayerConfig, TrainConfig  # noqa: E402
from dorylus_tpu.engine.engine import Engine  # noqa: E402
from dorylus_tpu.graph.graph import synthetic_graph  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1,
                    help="fraction of Reddit V (233k) / E (11.6M)")
    ap.add_argument("--kernel", default="degree",
                    choices=["xla", "degree", "pallas"])
    ap.add_argument("--model", default="gat")
    ap.add_argument("--edge-chunk", type=int, default=-1,
                    help="-1 = engine auto (4M past 8M edges)")
    ap.add_argument("--tpu", action="store_true",
                    help="leave the real TPU backend in place")
    ap.add_argument("--skip-run", action="store_true")
    args = ap.parse_args()

    v = int(232965 * args.scale)
    deg = 50
    g = synthetic_graph(v, deg, 602, 41, seed=8888)
    layers = LayerConfig([602, 128, 41])
    cfg = TrainConfig(model=args.model, epochs=1, eval_every=0,
                      kernel=args.kernel,
                      edge_chunk=0 if args.edge_chunk < 0 else args.edge_chunk)
    eng = Engine(g, layers, cfg)
    print(f"V={g.num_vertices} E={g.num_edges} kernel={eng.kernel_selected} "
          f"edge_chunk={eng.cfg.edge_chunk}")

    model, cfg = eng.model, eng.cfg

    def loss_fn(params, batch):
        return model.loss(params, batch)

    def step(params, opt_state, batch, lr):
        from dorylus_tpu.optim.adam import adam_update
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        params, opt_state = adam_update(params, grads, opt_state, lr=lr)
        return params, opt_state, loss

    lr = jnp.float32(0.005)
    t0 = time.perf_counter()
    traced = jax.jit(step).trace(eng.params, eng.opt_state, eng.batch, lr)
    t1 = time.perf_counter()
    n_eqns = len(traced.jaxpr.eqns)
    print(f"trace: {t1 - t0:.2f}s  ({n_eqns} top-level eqns)")
    lowered = traced.lower()
    t2 = time.perf_counter()
    txt = lowered.as_text()
    print(f"lower: {t2 - t1:.2f}s  (stablehlo {len(txt) / 1e6:.1f} MB, "
          f"{txt.count(chr(10))} lines)")
    compiled = lowered.compile()
    t3 = time.perf_counter()
    print(f"compile: {t3 - t2:.2f}s", flush=True)
    if not args.skip_run:
        out = compiled(eng.params, eng.opt_state, eng.batch, lr)
        jax.block_until_ready(out)
        t4 = time.perf_counter()
        print(f"run1: {t4 - t3:.2f}s")


if __name__ == "__main__":
    main()
