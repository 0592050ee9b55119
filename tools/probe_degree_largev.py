"""TPU probe: degree kernel at large V (past the segment_sum VMEM cliff).

V=1.6M (Amazon-ish), E=23M, F=128. Compares:
  - edgewise segment_sum (known to collapse ~12x at this V)
  - dst-blocked XLA path (the current engine fallback)
  - degree kernel, plain final reduce
  - degree kernel, blocked final reduce (out_block_rows=131072)
Decides the engine's large-V default.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dorylus_tpu.ops.degree_spmm import DegreeSpMM
from dorylus_tpu.ops.spmm import build_dst_blocks, spmm_dst_blocked, spmm_edgewise

V, F = 1_600_000, 128
DEG = 15
E = V * DEG


def timeit(fn, args, iters=5, tag=""):
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
    val_np = (rng.normal(0, 1, size=E) * 1e-3).astype(np.float32)
    h = jnp.asarray(rng.normal(0, 1, size=(V, F)).astype(np.float32))
    val = jnp.asarray(val_np)
    sj, dj = jnp.asarray(src), jnp.asarray(dst)

    print(f"V={V} E={E} F={F}", flush=True)

    def ew(c, h, v):
        return spmm_edgewise(h + c * 1e-20, sj, dj, v, V, sorted_dst=True)

    timeit(ew, (h, val), tag="edgewise (cliff regime)")

    blk, brows = build_dst_blocks(src, dst, val_np, V)
    blk = jax.tree.map(jnp.asarray, blk)

    def dstb(c, blk, h):
        return spmm_dst_blocked(h + c * 1e-20, blk, V, brows)

    timeit(dstb, (blk, h), tag="dst-blocked XLA (current fallback)")
    del blk

    t0 = time.perf_counter()
    op_p = DegreeSpMM(src, dst, V, V, block=16, out_block_rows=0)
    print(f"plan build (plain): {time.perf_counter()-t0:.1f}s", flush=True)

    def dp(c, arrs, h, v):
        return op_p.apply(arrs, h + c * 1e-20, v)

    timeit(dp, (op_p.arrays, h, val), tag="degree b=16, plain final reduce")
    del op_p

    t0 = time.perf_counter()
    op_b = DegreeSpMM(src, dst, V, V, block=16)  # auto out_block_rows
    print(f"plan build (blocked): {time.perf_counter()-t0:.1f}s "
          f"obr={op_b.static[4]}", flush=True)

    def db(c, arrs, h, v):
        return op_b.apply(arrs, h + c * 1e-20, v)

    timeit(db, (op_b.arrays, h, val), tag="degree b=16, blocked final reduce")

    def db_g(c, arrs, h, v):
        return jax.grad(lambda hh: (op_b.apply(arrs, hh, v) ** 2).sum())(
            h + c * 1e-20)

    timeit(db_g, (op_b.arrays, h, val), tag="degree blocked fwd+dh (GCN case)")


if __name__ == "__main__":
    main()
