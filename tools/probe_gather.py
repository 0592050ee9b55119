"""Probe XLA gather/segment-sum regimes on the attached TPU.

Questions (shapes Reddit-like: V=233k, E=11.6M, F=128):
  1. gather-only rate vs TABLE size (VMEM cliff like the segment_sum
     output cliff in ops/spmm.py build_dst_blocks?)
  2. dtype scaling: bf16 table vs f32 (bandwidth- or instruction-bound?)
  3. F scaling: 32 vs 128 (per-row overhead vs per-byte)
  4. segment_sum-only rate (pre-materialized messages)
  5. full SpMM f32 vs bf16

Big arrays are generated ON DEVICE (host upload rides a ~150 MB/s tunnel)
and scoped per section (16 GB HBM: at most one (E,F) buffer live).
Timing: N iters inside one jit, scalar carry + float() readback.
"""

import gc
import time

import numpy as np
import jax
import jax.numpy as jnp


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
    print(f"{tag:34s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


V, F = 232_965, 128
E = V * 50


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = jax.random.normal(k1, (V, F), jnp.float32)
    sj = jax.random.randint(k2, (E,), 0, V, jnp.int32)
    dj = jnp.sort(jax.random.randint(k3, (E,), 0, V, jnp.int32))
    val = jax.random.normal(k4, (E,), jnp.float32) * 1e-3

    print(f"V={V} E={E} F={F}", flush=True)

    def gath(c, h, s):
        return h[s] * (1 + c * 1e-20)

    # --- 1. gather-only (output (E,F) ~5.9GB live inside jit) ---
    dt = timeit(gath, (h, sj), tag="gather full-table f32")
    print(f"    -> {E/dt/1e6:.1f} M rows/s  {E*F*4/dt/1e9:.1f} GB/s", flush=True)

    s32 = sj % 32_768
    dt = timeit(gath, (h[:32_768], s32), tag="gather 32k-table f32")
    print(f"    -> {E/dt/1e6:.1f} M rows/s", flush=True)

    s8 = sj % 8_192
    dt = timeit(gath, (h[:8_192], s8), tag="gather 8k-table f32")
    print(f"    -> {E/dt/1e6:.1f} M rows/s", flush=True)

    dt = timeit(gath, (h.astype(jnp.bfloat16), sj), tag="gather full-table bf16")
    print(f"    -> {E/dt/1e6:.1f} M rows/s  {E*F*2/dt/1e9:.1f} GB/s", flush=True)

    dt = timeit(gath, (h[:, :32], sj), tag="gather full-table f32 F=32")
    print(f"    -> {E/dt/1e6:.1f} M rows/s  {E*32*4/dt/1e9:.1f} GB/s", flush=True)

    dt = timeit(gath, (h, jnp.sort(sj)), tag="gather sorted-idx f32")
    print(f"    -> {E/dt/1e6:.1f} M rows/s", flush=True)

    # --- 2. full SpMM (gather + weight + sorted segsum) ---
    def spmm(c, h, s, d, v):
        m = h[s] * v[:, None].astype(h.dtype) * (1 + c * 1e-20)
        return jax.ops.segment_sum(m.astype(jnp.float32), d, num_segments=V,
                                   indices_are_sorted=True)

    dt = timeit(spmm, (h, sj, dj, val), iters=5, tag="spmm flat f32")
    print(f"    -> {E/dt/1e6:.1f} M edges/s", flush=True)

    dt = timeit(spmm, (h.astype(jnp.bfloat16), sj, dj, val), iters=5,
                tag="spmm flat bf16-gather")
    print(f"    -> {E/dt/1e6:.1f} M edges/s", flush=True)

    # --- 3. segsum-only on pre-materialized messages ---
    msgs = jax.random.normal(k1, (E, F), jnp.float32) * 1e-3

    def seg(c, m, d):
        return jax.ops.segment_sum(m * (1 + c * 1e-20), d, num_segments=V,
                                   indices_are_sorted=True)

    dt = timeit(seg, (msgs, dj), iters=5, tag="segsum-only sorted V=233k")
    print(f"    -> {E/dt/1e6:.1f} M edges/s", flush=True)

    del msgs
    gc.collect()

    # --- 4. scatter-free lower bound: stream (E,F), reduce to (V,F) by
    # reshape (E = V*50 exactly) — pure bandwidth reference ---
    msgs2 = jax.random.normal(k2, (E, F), jnp.float32)

    def reshape_sum(c, m):
        return m.reshape(V, 50, F).sum(1) * (1 + c * 1e-20)

    dt = timeit(reshape_sum, (msgs2,), iters=5, tag="reshape-sum (bandwidth ref)")
    print(f"    -> {E/dt/1e6:.1f} M rows/s  {E*F*4/dt/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
