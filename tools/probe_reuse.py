"""Time pair-reuse aggregation (graph/reuse.py) on the real TPU.

The gather is row-rate-bound (tools/probe_narrow_gather.py: ~540 M slot
rows/s for bf16 and int8 alike), so the pair rewrite's row reduction
should translate ~1:1 into kernel time IF the pair-table build (two
(P, F) gathers + add + concat) doesn't trip an XLA anomaly — round-3
probes saw a concat'd-table gather run 1.4x slow once
(probe_close_bound.py sentinel variant), so the build is measured both
in-chain and with a prebuilt table.

Graph: Reddit-scale community-core graph — vertices draw most neighbors
Zipf-weighted from their community's popular core, the real-social-graph
shape where neighbor lists overlap (and the shape HAG-style reuse was
designed for). A uniform-random graph yields ~no pairs by construction
(tests/test_reuse.py) and is reported as the degradation case.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.graph.reuse import mine_reuse  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM  # noqa: E402

V, F, DEG = 232_965, 128, 50
COMM = 500  # community size


def community_graph(v=V, deg=DEG, comm=COMM, core=80, p_core=0.8, seed=0):
    # Moved into the package (same RNG sequence — measured numbers stand).
    from dorylus_tpu.graph.graph import community_core_edges
    return community_core_edges(v, deg, comm=comm, core=core,
                                p_core=p_core, seed=seed)


def timeit(fn, args, iters=10, tag="", edges=1):
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
    print(f"{tag:56s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    src, dst = community_graph()
    e = len(src)
    print(f"community graph: V={V} E={e}", flush=True)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(0, 0.3, size=(V, F)).astype(np.float32))

    # Baseline: plain hyb mask pass (the GAT/unit-weight production form).
    op0 = HybSpMM(src, dst, V, V, feature_dim=F, gather_dtype=jnp.bfloat16)

    def plain(c, h, arrs):
        hh = h + c * 1e-20
        from dorylus_tpu.ops.hyb_spmm import _hyb_pass
        return _hyb_pass(hh, arrs, V, "mask", None, jnp.bfloat16)

    timeit(plain, (h, op0.arrays["fwd"]), tag="plain hyb mask pass", edges=e)

    for passes in (1, 2):
        t0 = time.perf_counter()
        plan = mine_reuse(src, dst, V, min_uses=3, passes=passes)
        mine_s = time.perf_counter() - t0
        st = plan.stats
        print(f"passes={passes}: pairs={plan.num_pairs} "
              f"rows {st['rows_before']} -> {st['rows_after']} "
              f"(-{st['row_reduction']:.1%}), mined in {mine_s:.1f}s",
              flush=True)
        op = HybSpMM(plan.src, plan.dst, plan.table_size, V,
                     feature_dim=F, gather_dtype=jnp.bfloat16)
        levels = [jnp.asarray(l) for l in plan.levels]

        def chain(c, h, arrs, *lvls):
            hh = h + c * 1e-20
            tbl = hh
            for p in lvls:
                tbl = jnp.concatenate([tbl, tbl[p[:, 0]] + tbl[p[:, 1]]])
            from dorylus_tpu.ops.hyb_spmm import _hyb_pass
            return _hyb_pass(tbl, arrs, V, "mask", None, jnp.bfloat16)

        timeit(chain, (h, op.arrays["fwd"], *levels),
               tag=f"reuse passes={passes} (build in-chain)", edges=e)

        # Prebuilt table: isolates the rewritten pass from the build.
        tblp = np.asarray(h)
        for p in plan.levels:
            tblp = np.concatenate([tblp, tblp[p[:, 0]] + tblp[p[:, 1]]])
        tblj = jnp.asarray(tblp)

        def rewritten_only(c, tbl, arrs):
            tt = tbl + c * 1e-20
            from dorylus_tpu.ops.hyb_spmm import _hyb_pass
            return _hyb_pass(tt, arrs, V, "mask", None, jnp.bfloat16)

        timeit(rewritten_only, (tblj, op.arrays["fwd"]),
               tag=f"reuse passes={passes} (prebuilt table)", edges=e)
        del op, tblj


if __name__ == "__main__":
    main()
