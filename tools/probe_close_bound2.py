"""Round-3 headline probe #2: bucket-per-vertex layout vs segment_sum.

probe_close_bound.py found (block=16, Reddit shape):
  gather bound            26.9 ms
  + vals multiply + sum   31.9 ms   (the multiply/reduce adds 5.0)
  + sorted segment_sum    38.1 ms   (the segment adds 6.2)
  sentinel-row variant (concat table, no vals)  53.0 ms  <- anomaly

This probe:
  1. isolates the sentinel anomaly: same unweighted reduce with pads
     pointing at row 0 (wrong values, timing only) and with an
     iota-mask multiply instead of a concat'd zero row;
  2. measures segment_sum standalone on an (R, F) part tensor;
  3. prototypes the BUCKET layout: vertices sorted by degree, one slot
     row per vertex, row width = a per-bucket multiple of 8 chosen from
     the degree quantiles. Pads ~= block=8 (7%) but there are NO part
     rows and NO segment_sum — each bucket's reduce writes (Vb, F)
     output rows directly; the final combine is an inverse-permutation
     gather (or stays fused into the next op in a real layer).
     Stragglers (deg > max width) would spill to a tiny segment pass —
     absent in this Poisson(50) graph, handled in the production op.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan  # noqa: E402

V, F = 232_965, 128
E = V * 50


def timeit(fn, args, iters=10, tag="", edges=E):
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
    print(f"{tag:56s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    print(f"platform={jax.devices()[0].platform}  V={V} E={E} F={F}",
          flush=True)
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    h = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)

    plan = build_degree_plan(src, dst, None, V, 16)
    slot_src = jnp.asarray(plan["slot_src"])
    block_row = jnp.asarray(plan["block_row"])
    live_cnt = jnp.asarray(plan["live_cnt"])
    R = plan["slot_src"].shape[0]

    # 1a. unweighted reduce, pads -> row 0 (WRONG values; timing only).
    def b_prime(c, h, s):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        return hb[s].sum(axis=1, dtype=jnp.float32)

    timeit(b_prime, (h, slot_src), tag="1a. gather+sum, no mask (wrong pads)")

    # 1b. iota-mask multiply (in-register mask from (R,) counts).
    def b_mask(c, h, s, cnt):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        mask = (jax.lax.iota(jnp.int32, 16)[None, :]
                < cnt[:, None]).astype(msgs.dtype)
        return (msgs * mask[..., None]).sum(axis=1, dtype=jnp.float32)

    timeit(b_mask, (h, slot_src, live_cnt), tag="1b. gather+iota-mask+sum")

    # 2. segment_sum standalone over a materialized (R, F) part.
    part = jax.random.normal(jax.random.PRNGKey(1), (R, F), jnp.float32)

    def seg_only(c, p, br):
        return jax.ops.segment_sum(p * (1 + c * 1e-20), br, num_segments=V,
                                   indices_are_sorted=True)

    timeit(seg_only, (part, block_row), tag="2. segment_sum standalone (R->V)")

    # 3. bucket-per-vertex prototype.
    deg = np.bincount(dst, minlength=V)
    order = np.argsort(deg, kind="stable")
    deg_s = deg[order]
    # Bucket edges at degree quantiles; widths = ceil(deg/8)*8, deduped.
    qs = np.quantile(deg_s, np.linspace(0, 1, 17)[1:])
    widths = sorted(set(int(-(-int(q) // 8) * 8) for q in qs))
    print(f"   bucket widths: {widths}")
    estart = np.zeros(V + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=V), out=estart[1:])

    bucket_arrays = []
    total_slots = 0
    lo = 0
    for w in widths:
        hi = int(np.searchsorted(deg_s, w, side="right"))
        vb = order[lo:hi]
        if len(vb) == 0:
            lo = hi
            continue
        rows = np.zeros((len(vb), w), np.int32)  # pads -> row 0
        cnts = deg[vb].astype(np.int32)
        for i, vtx in enumerate(vb):
            rows[i, : deg[vtx]] = src[estart[vtx]:estart[vtx + 1]]
        bucket_arrays.append((jnp.asarray(rows), jnp.asarray(cnts), w))
        total_slots += rows.size
        lo = hi
    inv = np.empty(V, np.int64)
    inv[order] = np.arange(V)
    inv_j = jnp.asarray(inv)
    pad_frac = total_slots / E - 1
    print(f"   buckets={len(bucket_arrays)} slots={total_slots/1e6:.2f}M "
          f"pad={pad_frac:.1%}")

    def bucket_pass(c, h, inv, *bufs):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        outs = []
        for i in range(0, len(bufs), 2):
            s, cnt = bufs[i], bufs[i + 1]
            w = s.shape[1]
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            outs.append((msgs * mask[..., None]).sum(axis=1,
                                                     dtype=jnp.float32))
        cat = jnp.concatenate(outs)
        return cat[inv]

    flat = []
    for s, cnt, w in bucket_arrays:
        flat += [s, cnt]
    timeit(bucket_pass, (h, inv_j, *flat), tag="3. bucket-per-vertex full")

    # 3b. without the final inverse permutation (stay degree-ordered).
    def bucket_noperm(c, h, *bufs):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        outs = []
        for i in range(0, len(bufs), 2):
            s, cnt = bufs[i], bufs[i + 1]
            w = s.shape[1]
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            outs.append((msgs * mask[..., None]).sum(axis=1,
                                                     dtype=jnp.float32))
        return jnp.concatenate(outs)

    timeit(bucket_noperm, (h, *flat), tag="3b. bucket, no output permutation")

    # 3c. bucket gather bound: pure gathers of the same slot arrays.
    def bucket_gather(c, h, *bufs):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for i in range(0, len(bufs), 2):
            acc = acc + bufs[i].shape[1] * 0  # keep signature uniform
            acc = acc + hb[bufs[i]].ravel()[3].astype(jnp.float32)
        return jnp.reshape(acc, (1,))

    timeit(bucket_gather, (h, *flat), tag="3c. bucket gather-only bound")


if __name__ == "__main__":
    main()
