"""Bisect the reuse step-level inversion: op -> model -> step -> scan.

probe_reuse_vjp.py (on-chip): op+VJP reuse WINS (fwd 1.83x, grad 1.38x).
probe_reuse_epoch.py: the full Engine epoch LOSES (GCN 1241 -> 1598 ms).
An epoch runs 3 aggregation passes (fwd l1 @128, fwd l2 @32, bwd l2 @32),
so the op numbers predict reuse ~510 ms + dense overhead — something in
the composition adds ~1 s. This probe times the stack one addition at a
time, plain vs reuse, same graph/config as probe_reuse_epoch.py:

  A. grad(loss) of the real 2-layer GCN model (no update) — fori_loop
  B. A + SGD update (params carried through lax.scan epochs)
  C. A + Adam update (the engine's step, params+opt carried)

Mining results are disk-cached (/tmp) so reruns skip the ~5 min host
mining. Gradient hygiene: masked CE loss (data-dependent cotangent).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.common.config import LayerConfig  # noqa: E402
from dorylus_tpu.engine.batch import build_batch  # noqa: E402
from dorylus_tpu.graph.graph import Graph, community_core_edges  # noqa: E402
from dorylus_tpu.models.gcn import GCN  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM  # noqa: E402
from dorylus_tpu.optim.adam import adam_init, adam_update  # noqa: E402
import dorylus_tpu.ops.reuse_spmm as reuse_mod  # noqa: E402

V, DEG, F = 1_600_000, 15, 128
CACHE = Path("/tmp/reuse_mine_cache")


def cached_mine(src, dst, num_vertices, min_uses=3, passes=1):
    from dorylus_tpu.graph.reuse import ReusePlan, mine_reuse
    key = (f"{len(src)}_{num_vertices}_{min_uses}_{passes}_"
           f"{int(src[:50].sum())}_{int(dst[-50:].sum())}")
    path = CACHE / f"{key}.npz"
    if path.exists():
        z = np.load(path)
        nlv = int(z["nlv"])
        return ReusePlan(
            levels=[z[f"lvl{i}"] for i in range(nlv)], src=z["src"],
            dst=z["dst"], num_vertices=num_vertices,
            table_size=int(z["table_size"]),
            stats={"rows_before": int(z["rows_before"]),
                   "rows_after": int(z["rows_after"]),
                   "row_reduction": float(z["row_reduction"])})
    t0 = time.perf_counter()
    plan = mine_reuse(src, dst, num_vertices, min_uses=min_uses,
                      passes=passes)
    print(f"  mined {key} in {time.perf_counter()-t0:.0f}s", flush=True)
    CACHE.mkdir(exist_ok=True)
    np.savez(path, nlv=len(plan.levels), src=plan.src, dst=plan.dst,
             table_size=plan.table_size,
             rows_before=plan.stats["rows_before"],
             rows_after=plan.stats["rows_after"],
             row_reduction=plan.stats["row_reduction"],
             **{f"lvl{i}": l for i, l in enumerate(plan.levels)})
    return plan


def build_graph():
    src, dst = community_core_edges(V, DEG, comm=400, core=60, p_core=0.85,
                                    seed=0)
    rng = np.random.default_rng(1)
    labels = ((np.arange(V) * 32) // V).astype(np.int32)
    feats = rng.normal(0, 0.3, size=(V, F)).astype(np.float32)
    return Graph(num_vertices=V, src=src, dst=dst, features=feats,
                 labels=labels, num_classes=32).finalize()


def time_scalar(fn, args, iters=3, tag=""):
    @jax.jit
    def loop(*a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s}: {dt*1e3:9.1f} ms", flush=True)
    return dt


def time_step(step, params, opt, batch, iters=3, tag=""):
    """Scan `iters` update steps (params [+opt] carried), read final loss."""
    @jax.jit
    def loop(params, opt, batch):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, batch)
            return (p, o), loss
        (_, _), losses = jax.lax.scan(body, (params, opt), None,
                                      length=iters)
        return losses[-1]

    float(loop(params, opt, batch))
    t0 = time.perf_counter()
    float(loop(params, opt, batch))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s}: {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    g = build_graph()
    print(f"V={V} E={g.num_edges}", flush=True)
    layers = LayerConfig([F, 128, 32])

    reuse_mod.mine_reuse = cached_mine  # patch in the disk cache

    ops = {
        "plain": HybSpMM(g.src, g.dst, V, V, feature_dim=F,
                         gather_dtype=jnp.bfloat16,
                         static_val=np.asarray(g.edge_norm)),
        "reuse": reuse_mod.ReuseSpMM(
            g.src, g.dst, V, V, feature_dim=F, gather_dtype=jnp.bfloat16,
            rank1_factor=np.sqrt(g.self_norm), passes=2),
    }

    for name, op in ops.items():
        model = GCN(layers, spmm_op=op)
        params = model.init_params(exact_reference=False)
        batch = build_batch(g)._replace(aux={"spmm": op.arrays})

        def grad_probe(c, params, batch):
            p = jax.tree.map(lambda x: x + c * 1e-20, params)
            gr = jax.grad(model.loss)(p, batch)
            return gr["w0"].ravel()[0].astype(jnp.float32)

        time_scalar(grad_probe, (params, batch),
                    tag=f"A grad(model.loss)   {name}")

        def sgd_step(p, o, batch):
            loss, gr = jax.value_and_grad(model.loss)(p, batch)
            p = jax.tree.map(lambda a, b: a - 0.01 * b, p, gr)
            return p, o, loss

        time_step(sgd_step, params, None, batch,
                  tag=f"B scan sgd step      {name}")

        opt = adam_init(params)

        def adam_step(p, o, batch):
            loss, gr = jax.value_and_grad(model.loss)(p, batch)
            p, o = adam_update(p, gr, o, jnp.float32(0.01))
            return p, o, loss

        time_step(adam_step, params, opt, batch,
                  tag=f"C scan adam step     {name}")


if __name__ == "__main__":
    main()
