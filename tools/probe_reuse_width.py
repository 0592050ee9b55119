"""Reuse vs plain per-width: the bisect (probe_reuse_bisect.py) pinned
the step-level inversion inside the 2-layer model GRADIENT (plain 1229 ms
vs reuse 1693; Adam/scan innocent), while the isolated width-128 op+VJP
wins 1.38-1.83x. The model's second layer aggregates at width 32
(transform-first), so this probe times apply_static fwd and grad at
F=128 and F=32 — if reuse loses at narrow widths, the table-build
gathers (4P pair rows per build, f32) stop amortizing against the
slot-row win there.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.graph.graph import Graph, community_core_edges  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM  # noqa: E402
import dorylus_tpu.ops.reuse_spmm as reuse_mod  # noqa: E402
from tools.probe_reuse_bisect import cached_mine, V, DEG  # noqa: E402,F401


def timeit(fn, args, iters=5, tag="", edges=1):
    import time

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
    print(f"{tag:36s}: {dt*1e3:9.2f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    src, dst = community_core_edges(V, DEG, comm=400, core=60, p_core=0.85,
                                    seed=0)
    e = len(src)
    g = Graph(num_vertices=V, src=src, dst=dst,
              features=np.zeros((V, 1), np.float32),
              labels=np.zeros(V, np.int32), num_classes=2).finalize()
    print(f"V={V} E={e}", flush=True)
    reuse_mod.mine_reuse = cached_mine

    plain = HybSpMM(src, dst, V, V, feature_dim=128,
                    gather_dtype=jnp.bfloat16,
                    static_val=np.asarray(g.edge_norm))
    f1 = np.sqrt(g.self_norm).astype(np.float32)
    reuse = reuse_mod.ReuseSpMM(src, dst, V, V, feature_dim=128,
                                gather_dtype=jnp.bfloat16, rank1_factor=f1,
                                passes=2)
    rng = np.random.default_rng(1)

    for width in (128, 32):
        h = jnp.asarray(rng.normal(0, 0.3, size=(V, width)).astype(np.float32))

        def fwd_plain(c, h, arrs):
            return plain.apply_static(arrs, h + c * 1e-20)

        def fwd_reuse(c, h, arrs):
            return reuse.apply_static(arrs, h + c * 1e-20)

        def grad_of(fwd):
            def g_(c, h, *rest):
                def loss(hh):
                    out = fwd(c, hh, *rest)
                    return (out.astype(jnp.float32) ** 2).sum()
                return jax.grad(loss)(h)
            return g_

        timeit(fwd_plain, (h, plain.arrays), tag=f"F={width} fwd plain",
               edges=e)
        timeit(fwd_reuse, (h, reuse.arrays), tag=f"F={width} fwd reuse",
               edges=e)
        timeit(grad_of(fwd_plain), (h, plain.arrays),
               tag=f"F={width} grad plain", edges=e)
        timeit(grad_of(fwd_reuse), (h, reuse.arrays),
               tag=f"F={width} grad reuse", edges=e)


if __name__ == "__main__":
    main()
