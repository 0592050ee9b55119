"""TPU probe: DegreeSpMM (degree-padded blocked) vs spmm_edgewise.

Reddit-shaped graph (V=233k, E=11.6M, F=128). Times forward and fwd+bwd
for both kernels. Honest tunnel timing: iters inside one jit, scalar carry,
float() readback (see CLAUDE.md).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dorylus_tpu.ops.spmm import spmm_edgewise
from dorylus_tpu.ops.degree_spmm import DegreeSpMM


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
    print(f"{tag:40s}: {dt*1e3:9.3f} ms  {E/dt/1e6:8.1f} M edges/s", flush=True)
    return dt


V, F = 232_965, 128
DEG = 50
E = V * DEG


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, size=E).astype(np.int32))
    val_np = (rng.normal(0, 1, size=E) * 1e-3).astype(np.float32)

    h = jnp.asarray(rng.normal(0, 1, size=(V, F)).astype(np.float32))
    sj, dj = jnp.asarray(src), jnp.asarray(dst)
    val = jnp.asarray(val_np)

    print(f"V={V} E={E} F={F}", flush=True)

    # baseline: current edgewise path
    def edgewise(c, h, s, d, v):
        return spmm_edgewise(h + c * 1e-20, s, d, v, V, sorted_dst=True)

    timeit(edgewise, (h, sj, dj, val), tag="edgewise fwd f32")

    def edgewise_g(c, h, s, d, v):
        def loss(h, v):
            return spmm_edgewise(h, s, d, v, V, sorted_dst=True).sum()
        gh, gv = jax.grad(loss, argnums=(0, 1))(h + c * 1e-20, v)
        return gh + gv[:V, None]

    timeit(edgewise_g, (h, sj, dj, val), tag="edgewise fwd+bwd f32")

    # degree-padded path, block sweep
    for block in (8, 16, 32):
        t0 = time.perf_counter()
        op = DegreeSpMM(src, dst, V, V, block=block)
        print(f"  plan build block={block}: {time.perf_counter()-t0:.1f}s "
              f"R={op.arrays['fwd']['slot_src'].shape[0]}", flush=True)

        def deg_fwd(c, arrs, h, v):
            return op.apply(arrs, h + c * 1e-20, v)

        timeit(deg_fwd, (op.arrays, h, val), tag=f"degree b={block} fwd f32")

        def deg_g(c, arrs, h, v):
            def loss(h, v):
                return op.apply(arrs, h, v).sum()
            gh, gv = jax.grad(loss, argnums=(0, 1))(h + c * 1e-20, v)
            return gh + gv[:V, None]

        timeit(deg_g, (op.arrays, h, val), tag=f"degree b={block} fwd+bwd f32")

    # bf16 gather variant at the best block
    op = DegreeSpMM(src, dst, V, V, block=16, gather_dtype=jnp.bfloat16)

    def deg_bf(c, arrs, h, v):
        return op.apply(arrs, h + c * 1e-20, v)

    timeit(deg_bf, (op.arrays, h, val), tag="degree b=16 fwd bf16-gather")


if __name__ == "__main__":
    main()
