"""Isolate the pair-reuse step-level regression: op+VJP alone at V=1.6M.

probe_reuse_largev.py: the reuse FORWARD mask pass wins 1.88x. But
probe_reuse_epoch.py: a full GCN epoch is 1.29x SLOWER with reuse
(1241 -> 1598 ms, identical loss). This probe times forward-only and
grad(fwd) for the production ops (HybSpMM.apply_static with baked vals
vs ReuseSpMM.apply_static with the rank-1 factorization, plus the GAT
apply_dst forms) to find where the win dies: the custom VJP, the f32
table build, or the rank-1 scaling.

Gradient-timing hygiene: loss = (out**2).sum() so the cotangent is
data-dependent (a ones cotangent lets XLA DCE the forward and
constant-fold the backward gathers — CLAUDE.md).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.graph.graph import Graph, community_core_edges  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM  # noqa: E402
from dorylus_tpu.ops.reuse_spmm import ReuseSpMM  # noqa: E402

V, F, DEG = 1_600_000, 128, 15


def timeit(fn, args, iters=5, tag="", edges=1):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[3].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:44s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    src, dst = community_core_edges(V, DEG, comm=400, core=60, p_core=0.85,
                                    seed=0)
    e = len(src)
    print(f"V={V} E={e}", flush=True)
    g = Graph(num_vertices=V, src=src, dst=dst,
              features=np.zeros((V, 1), np.float32),
              labels=np.zeros(V, np.int32), num_classes=2).finalize()
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(0, 0.3, size=(V, F)).astype(np.float32))

    plain = HybSpMM(src, dst, V, V, feature_dim=F, gather_dtype=jnp.bfloat16,
                    static_val=np.asarray(g.edge_norm))
    f1 = np.sqrt(g.self_norm).astype(np.float32)
    reuse = ReuseSpMM(src, dst, V, V, feature_dim=F,
                      gather_dtype=jnp.bfloat16, rank1_factor=f1, passes=2)

    def fwd_plain(c, h, arrs):
        return plain.apply_static(arrs, h + c * 1e-20)

    def fwd_reuse(c, h, arrs):
        return reuse.apply_static(arrs, h + c * 1e-20)

    def gat_plain(c, h, arrs, dv):
        return plain.apply_dst(arrs, h + c * 1e-20, dv)

    def gat_reuse(c, h, arrs, dv):
        return reuse.apply_dst(arrs, h + c * 1e-20, dv)

    def grad_of(fwd):
        def g_(c, h, *rest):
            def loss(hh):
                out = fwd(c, hh, *rest)
                return (out.astype(jnp.float32) ** 2).sum()
            return jax.grad(loss)(h)
        return g_

    dv = jnp.asarray(rng.normal(0, 0.3, size=V).astype(np.float32))
    timeit(fwd_plain, (h, plain.arrays), tag="GCN static fwd plain", edges=e)
    timeit(fwd_reuse, (h, reuse.arrays), tag="GCN static fwd reuse", edges=e)
    timeit(grad_of(fwd_plain), (h, plain.arrays),
           tag="GCN static grad plain", edges=e)
    timeit(grad_of(fwd_reuse), (h, reuse.arrays),
           tag="GCN static grad reuse", edges=e)
    timeit(gat_plain, (h, plain.arrays, dv), tag="GAT dst fwd plain", edges=e)
    timeit(gat_reuse, (h, reuse.arrays, dv), tag="GAT dst fwd reuse", edges=e)
    timeit(grad_of(gat_plain), (h, plain.arrays, dv),
           tag="GAT dst grad plain", edges=e)
    timeit(grad_of(gat_reuse), (h, reuse.arrays, dv),
           tag="GAT dst grad reuse", edges=e)


if __name__ == "__main__":
    main()
