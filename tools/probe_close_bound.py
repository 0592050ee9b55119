"""Close the degree kernel to its own gather bound (round-3 headline work).

BENCH_r02: static-vals bf16 pass = 38.7 ms at Reddit shape vs a 25.1 ms
pure-gather bound (fraction 0.649). This probe decomposes the 13.5 ms of
non-gather overhead and tests two structural attacks:

1. RANK-1 FACTORIZATION. GCN's edge values are exactly
   deg(src)^-1/2 * deg(dst)^-1/2 (dataloader.cpp:153-185) — a rank-1
   src x dst outer product. Pre-scale the table rows by f[src] (fused
   into the bf16 convert the pass already pays), post-scale the output
   rows by g[dst] (a (V,F) elementwise op), and the (R,B) slot-value
   array plus its broadcast multiply vanish from the kernel. Pad slots
   are killed by pointing them at an appended all-zero table row
   (sentinel index V) instead of by val=0 — no mask, no multiply.

2. BLOCK-SIZE SWEEP. Bigger blocks add pad-gather bytes but shrink the
   (R,F) part tensor and the final sorted segment_sum's row count; the
   sweep finds where the sum of the two costs bottoms out.

Per-component ladder at block=16 (each step adds one stage):
  a. gather only                        (the bound)
  b. + sum(axis=1) f32                  (fixed-width reduce)
  c. + sorted segment_sum over block_row (the full factorized pass)
  d. b with the (R,B) vals multiply     (isolates the multiply)
  e. d + segment_sum                    (the current static-vals pass)
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
    print(f"{tag:52s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def build(block):
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    plan = build_degree_plan(src, dst, None, V, block)
    r, b = plan["slot_src"].shape
    live = (np.arange(b)[None, :] < plan["live_cnt"][:, None])
    slot_sent = np.where(live, plan["slot_src"], V).astype(np.int32)
    # Static per-slot values (the current headline's layout).
    val = rng.random(E).astype(np.float32) * 1e-3
    ve = np.r_[val, 0.0]
    vals = ve[np.asarray(plan["slot_to_edge"])]
    return {
        "slot_src": jnp.asarray(plan["slot_src"]),
        "slot_sent": jnp.asarray(slot_sent),
        "block_row": jnp.asarray(plan["block_row"]),
        "vals": jnp.asarray(vals),
        "n_slots": r * b,
    }


def main():
    print(f"platform={jax.devices()[0].platform}  V={V} E={E} F={F}",
          flush=True)
    h = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)
    f = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (V,))) + 0.1
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (V,))) + 0.1

    # --- component ladder at block=16 ---
    p16 = build(16)
    print(f"\nblock=16: slots={p16['n_slots']/1e6:.2f}M "
          f"(pad {p16['n_slots']/E-1:.1%}), part rows={len(p16['block_row'])/1e3:.0f}k")

    def a_gather(c, h, s):
        return (h * (1 + c * 1e-20)).astype(jnp.bfloat16)[s]

    timeit(a_gather, (h, p16["slot_src"]), tag="a. gather only (bound)")

    def b_reduce(c, h, s):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        hx = jnp.concatenate([hb, jnp.zeros((1, F), jnp.bfloat16)])
        return hx[s].sum(axis=1, dtype=jnp.float32)

    timeit(b_reduce, (h, p16["slot_sent"]), tag="b. + sum(axis=1)")

    def c_full_fact(c, h, s, br, f, g):
        hb = ((h * (1 + c * 1e-20)) * f[:, None]).astype(jnp.bfloat16)
        hx = jnp.concatenate([hb, jnp.zeros((1, F), jnp.bfloat16)])
        part = hx[s].sum(axis=1, dtype=jnp.float32)
        out = jax.ops.segment_sum(part, br, num_segments=V,
                                  indices_are_sorted=True)
        return out * g[:, None]

    timeit(c_full_fact, (h, p16["slot_sent"], p16["block_row"], f, g),
           tag="c. factorized full (prescale+seg+postscale)")

    def d_vals(c, h, s, v):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        return (msgs * v[..., None].astype(msgs.dtype)).sum(
            axis=1, dtype=jnp.float32)

    timeit(d_vals, (h, p16["slot_src"], p16["vals"]), tag="d. b + vals multiply")

    def e_current(c, h, s, v, br):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        part = (msgs * v[..., None].astype(msgs.dtype)).sum(
            axis=1, dtype=jnp.float32)
        return jax.ops.segment_sum(part, br, num_segments=V,
                                   indices_are_sorted=True)

    timeit(e_current, (h, p16["slot_src"], p16["vals"], p16["block_row"]),
           tag="e. current static-vals pass")

    # --- block sweep of the factorized pass ---
    print("\nblock sweep (factorized pass + its own gather bound):")
    for blk in (8, 16, 32, 64):
        p = build(blk)
        pad = p["n_slots"] / E - 1
        tag = (f"block={blk:3d} slots={p['n_slots']/1e6:5.2f}M "
               f"pad={pad:5.1%} rows={len(p['block_row'])/1e3:4.0f}k")
        dt_g = timeit(a_gather, (h, p["slot_src"]), tag=f"  {tag} | gather")
        dt_f = timeit(c_full_fact, (h, p["slot_sent"], p["block_row"], f, g),
                      tag=f"  {tag} | full")
        print(f"    -> fraction_of_own_bound = {dt_g/dt_f:.3f}", flush=True)


if __name__ == "__main__":
    main()
