"""Round-2 roofline probe: what limits SpMM aggregation, and what buys it back.

Questions (Reddit shape V=233k, E=11.6M, F=128, v5e ~819 GB/s HBM):
  A. gather rate vs index pattern: random / sorted / local windows of
     radius 1k / 16k / 128k  (f32 and bf16 tables)
     -> is the 87 GB/s random-gather wall index-pattern-bound (locality
        reordering helps) or XLA-lowering-bound (sorted is just as slow)?
  B. degree-kernel fwd variants on the SAME uniform-random graph:
     current (R,B,F) formulation vs unrolled-over-B (B gathers of (R,F),
     summed in one fused expression — no (R,B,F) intermediate), f32/bf16,
     block 16 vs 8.
  C. degree-kernel fwd on a CLUSTERED graph (src within +-window of dst):
     the locality headroom a BFS/RCM reorder could unlock on a real graph.

Timing per CLAUDE.md: N iters inside one jit, scalar carry, float readback.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan, _degree_pass  # noqa: E402

V, F = 232_965, 128
DEG = 50
E = V * DEG


def timeit(fn, args, iters=10, tag="", bytes_=None, edges=None):
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
    msg = f"{tag:44s}: {dt*1e3:9.3f} ms"
    if bytes_:
        msg += f"  {bytes_/dt/1e9:7.1f} GB/s"
    if edges:
        msg += f"  {edges/dt/1e6:7.1f} M edges/s"
    print(msg, flush=True)
    return dt


def gath(c, h, s):
    return h[s] * (1 + c * 1e-20)


def degree_fwd(c, h, plan, val):
    return _degree_pass(h * (1 + c * 1e-20), plan, V, val)


def degree_fwd_unrolled(c, h, plan, val):
    """No (R,B,F) intermediate: B gathers of (R,F), fused sum."""
    h = h * (1 + c * 1e-20)
    val_ext = jnp.concatenate([val.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
    vals = val_ext[plan["slot_to_edge"]]  # (R, B)
    B = plan["slot_src"].shape[1]
    part = None
    for b in range(B):
        m = h[plan["slot_src"][:, b]].astype(jnp.float32) * vals[:, b, None]
        part = m if part is None else part + m
    return jax.ops.segment_sum(part, plan["block_row"], num_segments=V,
                               indices_are_sorted=True)


def make_plan(src, dst, block):
    p = build_degree_plan(src, dst, None, V, block)
    p.pop("_out_block_rows", None)
    return {k: jnp.asarray(v) for k, v in p.items()}


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    h = jax.random.normal(k1, (V, F), jnp.float32)
    hb = h.astype(jnp.bfloat16)
    sj = jax.random.randint(k2, (E,), 0, V, jnp.int32)

    print(f"V={V} E={E} F={F}", flush=True)
    print("--- A. gather rate vs index pattern ---", flush=True)
    timeit(gath, (h, sj), tag="gather random f32", bytes_=E * F * 4)
    timeit(gath, (hb, sj), tag="gather random bf16", bytes_=E * F * 2)
    ss = jnp.sort(sj)
    timeit(gath, (h, ss), tag="gather sorted f32", bytes_=E * F * 4)
    timeit(gath, (hb, ss), tag="gather sorted bf16", bytes_=E * F * 2)
    for win in (1024, 16384, 131072):
        base = np.repeat(np.linspace(0, V - 1, E // DEG).astype(np.int64), DEG)
        idx = ((base + rng.integers(-win // 2, win // 2, E)) % V).astype(np.int32)
        ji = jnp.asarray(idx)
        timeit(gath, (h, ji), tag=f"gather local-window {win} f32", bytes_=E * F * 4)
        timeit(gath, (hb, ji), tag=f"gather local-window {win} bf16", bytes_=E * F * 2)

    print("--- B. degree-kernel fwd variants, uniform-random graph ---", flush=True)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))
    p16 = make_plan(src, dst, 16)
    timeit(degree_fwd, (h, p16, val), tag="degree b16 (R,B,F) f32", edges=E)
    timeit(degree_fwd, (hb, p16, val), tag="degree b16 (R,B,F) bf16-table", edges=E)
    timeit(degree_fwd_unrolled, (h, p16, val), tag="degree b16 unrolled f32", edges=E)
    timeit(degree_fwd_unrolled, (hb, p16, val), tag="degree b16 unrolled bf16", edges=E)
    p8 = make_plan(src, dst, 8)
    timeit(degree_fwd_unrolled, (h, p8, val), tag="degree b8 unrolled f32", edges=E)
    timeit(degree_fwd_unrolled, (hb, p8, val), tag="degree b8 unrolled bf16", edges=E)
    del p8

    print("--- C. clustered graph (locality headroom) ---", flush=True)
    for win in (16384, 131072):
        dstc = np.sort(rng.integers(0, V, E).astype(np.int64))
        srcc = ((dstc + rng.integers(-win // 2, win // 2, E)) % V).astype(np.int32)
        pc = make_plan(srcc, dstc.astype(np.int32), 16)
        timeit(degree_fwd, (h, pc, val), tag=f"degree b16 clustered w={win} f32", edges=E)
        timeit(degree_fwd, (hb, pc, val), tag=f"degree b16 clustered w={win} bf16", edges=E)
        timeit(degree_fwd_unrolled, (hb, pc, val),
               tag=f"degree b16 unroll clustered w={win} bf16", edges=E)
        del pc


if __name__ == "__main__":
    main()
