"""Pair reuse at large V — where it should actually pay.

tools/probe_reuse.py (Reddit scale, V=233k): the rewrite cut gathered
rows 35-45% but ran 1.4-1.7x SLOWER — appending pair rows grew the
bf16 table from 60 MB to 124 MB, crossing the table-size gather cliff
(~328 M rows/s under ~64 MB vs ~141 M above, largev_probe_r2.json), and
the regime loss ate the row win.

At large V the table is ALREADY in the slow regime, so extra pair rows
change nothing regime-wise and the row reduction should convert ~1:1.
This probe: V=1.6M community-core graph, E=24M, plain hyb mask pass vs
reuse passes=1/2 (prebuilt and in-chain tables).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.graph.reuse import mine_reuse  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM, _hyb_pass  # noqa: E402
from tools.probe_reuse import community_graph, timeit  # noqa: E402

V, F, DEG = 1_600_000, 128, 15


def main():
    src, dst = community_graph(v=V, deg=DEG, comm=400, core=60, p_core=0.85,
                               seed=0)
    e = len(src)
    print(f"community graph: V={V} E={e} "
          f"(bf16 table {V*F*2/1e6:.0f} MB)", flush=True)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(0, 0.3, size=(V, F)).astype(np.float32))

    op0 = HybSpMM(src, dst, V, V, feature_dim=F, gather_dtype=jnp.bfloat16)

    def plain(c, h, arrs):
        return _hyb_pass(h + c * 1e-20, arrs, V, "mask", None, jnp.bfloat16)

    timeit(plain, (h, op0.arrays["fwd"]), tag="plain hyb mask pass", edges=e)
    del op0

    for passes in (1, 2):
        t0 = time.perf_counter()
        plan = mine_reuse(src, dst, V, min_uses=3, passes=passes)
        mine_s = time.perf_counter() - t0
        st = plan.stats
        print(f"passes={passes}: pairs={plan.num_pairs} "
              f"rows {st['rows_before']} -> {st['rows_after']} "
              f"(-{st['row_reduction']:.1%}), table "
              f"{plan.table_size*F*2/1e6:.0f} MB, mined in {mine_s:.1f}s",
              flush=True)
        op = HybSpMM(plan.src, plan.dst, plan.table_size, V,
                     feature_dim=F, gather_dtype=jnp.bfloat16)
        levels = [jnp.asarray(l) for l in plan.levels]

        def chain(c, h, arrs, *lvls):
            tbl = h + c * 1e-20
            for p in lvls:
                tbl = jnp.concatenate([tbl, tbl[p[:, 0]] + tbl[p[:, 1]]])
            return _hyb_pass(tbl, arrs, V, "mask", None, jnp.bfloat16)

        timeit(chain, (h, op.arrays["fwd"], *levels),
               tag=f"reuse passes={passes} (build in-chain)", edges=e)

        tblp = np.asarray(h)
        for p in plan.levels:
            tblp = np.concatenate([tblp, tblp[p[:, 0]] + tblp[p[:, 1]]])
        tblj = jnp.asarray(tblp)

        def rewritten_only(c, tbl, arrs):
            return _hyb_pass(tbl + c * 1e-20, arrs, V, "mask", None,
                             jnp.bfloat16)

        timeit(rewritten_only, (tblj, op.arrays["fwd"]),
               tag=f"reuse passes={passes} (prebuilt table)", edges=e)
        del op, tblj


if __name__ == "__main__":
    main()
