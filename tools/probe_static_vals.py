"""GCN static slot values: precompute vals (R,B) into the plan.

GCN edge norms are static per graph, so the per-slot value gather
(val_ext[slot_to_edge], an R*B-index gather from an E-sized table) can be
done ONCE on the host and shipped as a plan array. Measures, at Reddit
shape (V=233k, E=11.6M, F=128, bf16 tables):
  a. runtime-val path (current headline)
  b. static-vals plan array
  c. fwd+bwd (GCN) for both
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import DegreeSpMM, _degree_pass  # noqa: E402

V, F = 232_965, 128
E = V * 50


def timeit(fn, args, iters=5, tag="", edges=E):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:44s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    val = rng.normal(0, 1e-3, E).astype(np.float32)
    op = DegreeSpMM(src, dst, V, V, block=16, gather_dtype=jnp.bfloat16,
                    feature_dim=F)
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (V, F), jnp.float32)
    vj = jnp.asarray(val)

    # Host-side slot values for both plans.
    def slot_vals(plan):
        ve = np.r_[val, 0.0].astype(np.float32)
        return jnp.asarray(ve[np.asarray(plan["slot_to_edge"])])

    fwd_vals = slot_vals(op.arrays["fwd"])
    bwd_vals = slot_vals(op.arrays["bwd"])

    timeit(lambda c, arrs, hh, vv: op.apply(arrs, hh * (1 + c * 1e-20), vv),
           (op.arrays, h, vj), tag="a. runtime-val fwd (headline)")

    def fwd_static(c, arrs, hh, fv):
        return _degree_pass(hh * (1 + c * 1e-20), arrs["fwd"], V, None,
                            gather_dtype=jnp.bfloat16, vals=fv)

    timeit(fwd_static, (op.arrays, h, fwd_vals), tag="b. static-vals fwd")

    def gcn_bwd_runtime(c, arrs, hh, vv):
        def loss(x):
            o = op.apply(arrs, x, vv)
            return (o * o).sum()
        return jax.grad(loss)(hh * (1 + c * 1e-20))

    timeit(gcn_bwd_runtime, (op.arrays, h, vj), tag="c. runtime-val fwd+dh")

    def gcn_bwd_static(c, arrs, hh, fv, bv):
        def loss(x):
            o = _degree_pass(x, arrs["fwd"], V, None,
                             gather_dtype=jnp.bfloat16, vals=fv)
            return (o * o).sum()
        # autodiff would scatter; emulate the custom bwd: one static pass
        # over the transposed plan with a data-dependent cotangent.
        o = _degree_pass(hh * (1 + c * 1e-20), arrs["fwd"], V, None,
                         gather_dtype=jnp.bfloat16, vals=fv)
        g = 2.0 * o
        dh = _degree_pass(g, arrs["bwd"], V, None,
                          gather_dtype=jnp.bfloat16, vals=bv)
        return dh

    timeit(gcn_bwd_static, (op.arrays, h, fwd_vals, bwd_vals),
           tag="d. static-vals fwd+dh (hand)")


if __name__ == "__main__":
    main()
