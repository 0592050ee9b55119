"""Benchmark the Pallas chain SpMM vs segment_sum on the attached TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dorylus_tpu.ops.pallas_spmm import PallasSpMM
from dorylus_tpu.ops.spmm import spmm_edgewise


def sync(x):
    float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def bench_loop(fn, h, *rest, iters=10):
    @jax.jit
    def loop(h, *rest):
        def body(i, x):
            return fn(x, *rest)
        return jax.lax.fori_loop(0, iters, body, h)

    t = time.perf_counter()
    out = loop(h, *rest)
    sync(out)
    compile_s = time.perf_counter() - t
    t = time.perf_counter()
    out = loop(h, *rest)
    sync(out)
    return (time.perf_counter() - t) / iters, compile_s


def make_edges(V, deg, clustered, seed=0):
    rng = np.random.default_rng(seed)
    E = V * deg
    if clustered:
        # Planted-community graph: 85% of edges inside 2048-vertex blocks —
        # the locality real datasets have after METIS/community reorder.
        blocks = V // 2048
        intra = int(E * 0.85)
        b = rng.integers(0, blocks, intra)
        src_i = b * 2048 + rng.integers(0, 2048, intra)
        dst_i = b * 2048 + rng.integers(0, 2048, intra)
        src_r = rng.integers(0, V, E - intra)
        dst_r = rng.integers(0, V, E - intra)
        src = np.r_[src_i, src_r]
        dst = np.r_[dst_i, dst_r]
    else:
        src = rng.integers(0, V, E)
        dst = rng.integers(0, V, E)
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order]


def main():
    V, F, DEG = 232_965, 128, 50
    rng = np.random.default_rng(1)
    h = rng.normal(size=(V, F)).astype(np.float32)
    hj = jnp.asarray(h)

    for clustered in (False, True):
        src, dst = make_edges(V, DEG, clustered)
        E = len(src)
        val = (rng.normal(size=E) * 1e-2).astype(np.float32)
        sj = jnp.asarray(src.astype(np.int32))
        dj = jnp.asarray(dst.astype(np.int32))
        vj = jnp.asarray(val)

        tag = "clustered" if clustered else "random   "
        dt, _ = bench_loop(
            lambda x, s, d, v: spmm_edgewise(x, s, d, v, V, sorted_dst=True),
            hj, sj, dj, vj, iters=5)
        print(f"[{tag}] segment_sum : {dt*1e3:8.2f} ms  {E/dt/1e6:8.1f} M edges/s",
              flush=True)

        t0 = time.perf_counter()
        op = PallasSpMM(src, dst, V, V)
        t_plan = time.perf_counter() - t0
        p = op.fwd
        stages = "->".join(str(st.n_seg * st.runs_per_seg) for st in p.stages)
        levels = (f"stages[{len(p.stages)}] runs {stages} "
                  f"final={len(p.final_dst)} ({p.compression:.3f}x)")
        dt, cs = bench_loop(
            lambda x, arrs, v: op.apply(arrs, x, v)[: x.shape[0]],
            hj, op.arrays, vj, iters=5)
        out = np.asarray(jax.jit(op.apply)(op.arrays, hj, vj))
        import scipy.sparse as sp
        want = sp.csr_matrix((val, (dst, src)), shape=(V, V)) @ h
        err = np.abs(out - want).max() / (np.abs(want).max() + 1e-9)
        print(f"[{tag}] pallas chain: {dt*1e3:8.2f} ms  {E/dt/1e6:8.1f} M edges/s  "
              f"{levels} plan {t_plan:.1f}s compile {cs:.1f}s relerr {err:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
