"""TPU probe: fused-SDDMM backward for DegreeSpMM vs edgewise, honest.

Loss is (out**2).sum() so the cotangent is data-dependent — with .sum()
the cotangent is a constant of ones and XLA DCEs the whole forward and
constant-folds the backward gathers (measured: a fake 20 ms "fwd+bwd").
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dorylus_tpu.ops.degree_spmm import DegreeSpMM
from dorylus_tpu.ops.spmm import spmm_edgewise

V, F = 232_965, 128
DEG = 50
E = V * DEG


def timeit(fn, args, iters=10, tag=""):
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
    print(f"{tag:44s}: {dt*1e3:9.3f} ms  {E/dt/1e6:8.1f} M edges/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, size=E).astype(np.int32))
    h = jnp.asarray(rng.normal(0, 1, size=(V, F)).astype(np.float32))
    val = jnp.asarray((rng.normal(0, 1, size=E) * 1e-3).astype(np.float32))
    sj, dj = jnp.asarray(src), jnp.asarray(dst)

    print(f"V={V} E={E} F={F}", flush=True)
    t0 = time.perf_counter()
    op = DegreeSpMM(src, dst, V, V, block=16)
    print(f"plan build: {time.perf_counter()-t0:.1f}s", flush=True)

    def d_fwd(c, arrs, h, v):
        return op.apply(arrs, h + c * 1e-20, v)

    def d_gh(c, arrs, h, v):
        return jax.grad(lambda hh: (op.apply(arrs, hh, v) ** 2).sum())(
            h + c * 1e-20)

    def d_ghv(c, arrs, h, v):
        gh, gv = jax.grad(lambda hh, vv: (op.apply(arrs, hh, vv) ** 2).sum(),
                          argnums=(0, 1))(h + c * 1e-20, v)
        return gh + gv[:V, None]

    def e_fwd(c, h, v):
        return spmm_edgewise(h + c * 1e-20, sj, dj, v, V, sorted_dst=True)

    def e_gh(c, h, v):
        return jax.grad(
            lambda hh: (spmm_edgewise(hh, sj, dj, v, V, sorted_dst=True)
                        ** 2).sum())(h + c * 1e-20)

    def e_ghv(c, h, v):
        gh, gv = jax.grad(
            lambda hh, vv: (spmm_edgewise(hh, sj, dj, vv, V, sorted_dst=True)
                            ** 2).sum(), argnums=(0, 1))(h + c * 1e-20, v)
        return gh + gv[:V, None]

    timeit(d_fwd, (op.arrays, h, val), tag="degree b=16 fwd")
    timeit(e_fwd, (h, val), tag="edgewise fwd")
    timeit(d_gh, (op.arrays, h, val), tag="degree fwd+dh (GCN case)")
    timeit(e_gh, (h, val), tag="edgewise fwd+dh (GCN case)")
    timeit(d_ghv, (op.arrays, h, val), tag="degree fwd+dh+dval (GAT case)")
    timeit(e_ghv, (h, val), tag="edgewise fwd+dh+dval (GAT case)")


if __name__ == "__main__":
    main()
