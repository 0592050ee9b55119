"""Round-3 probe: sub-bf16 gather tables (int8 / fp8) for the hyb kernel.

The aggregation gather is byte-rate-bound and pattern-independent
(tools/probe_roofline.py: f32 == bf16 in GB/s), which is why --agg-bf16
is the production mode. One more halving is on the table if 1-byte
element types gather at the same byte rate AND the mandatory
convert-after-gather (int8 -> f32 for the reduce) does not get hoisted
before the gather by XLA (the convert-hoist trap that killed the naive
bf16 attempt, tools/probe_bf16_gather.py — hoisting re-widens the
gather and the benefit vanishes).

Timing-loop note: carry-dependence is threaded through the INDEX array
(s ^ (c & 1)) so no dtype-specific arithmetic pollutes the chain — a
first version used `h + c.astype(int8) * 0`, which XLA constant-folds,
hoists the whole body out of the fori_loop, and reports fantasy rates.

Measures at Reddit slot shape (R=12M slot rows from a 233k-row table,
F=128):
  1. pure gather rate per dtype: f32 / bf16 / int8 / fp8_e4m3
     (scalar-pick readback, the bench's gather-bound pattern, plus a
     full-reduce cross-check);
  2. the full hyb-style chain (gather -> weight multiply -> sum f32)
     for int8/fp8 with the convert placed after the gather, with and
     without jax.lax.optimization_barrier pinning the gather output;
  3. an integer-domain chain: int8 msgs summed in int32 (no float
     convert on the E-sized tensor at all), scale applied per output
     row — the per-tensor-scale quantized aggregation candidate.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V, F = 232_965, 128
R = 12_000_000  # slot rows (~Reddit E with hyb padding)


def timeit(fn, args, iters=10, tag="", rows=R, itemsize=None):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[3].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        float(loop(*args))
    except Exception as ex:  # noqa: BLE001
        print(f"{tag:52s}: FAILED {type(ex).__name__}: {str(ex)[:80]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    isz = itemsize if itemsize is not None else args[0].dtype.itemsize
    gbs = rows * F * isz / dt / 1e9
    print(f"{tag:52s}: {dt*1e3:9.3f} ms  {rows/dt/1e6:7.1f} M rows/s  "
          f"{gbs:6.1f} GB/s", flush=True)
    return dt


def dep(s, c):
    """Make the index array depend on the loop carry (flips the low bit on
    odd carries; OOB rows clamp, which is fine for timing)."""
    return s ^ (c.astype(jnp.int32) & 1)


def main():
    rng = np.random.default_rng(0)
    hf = rng.normal(0, 0.3, size=(V, F)).astype(np.float32)
    s = jnp.asarray(rng.integers(0, V, size=R, dtype=np.int64), jnp.int32)
    sg = s.reshape(-1, 16)  # slot-grid shape (rows, w=16)
    wt = jnp.asarray(rng.random((R // 16, 16)), jnp.bfloat16)

    tables = {
        "f32": jnp.asarray(hf),
        "bf16": jnp.asarray(hf, jnp.bfloat16),
        "int8": jnp.asarray(np.clip(hf * 127, -127, 127).astype(np.int8)),
    }
    try:
        tables["fp8_e4m3"] = jnp.asarray(hf, jnp.float8_e4m3fn)
    except TypeError:
        print("fp8_e4m3 unavailable")

    # 1. pure gather, scalar pick (the bench's bound pattern).
    def gath(c, h, s):
        return h[dep(s, c)]

    for name, tb in tables.items():
        timeit(gath, (tb, s), tag=f"pure gather {name} (scalar pick)")

    # 1b. full-reduce cross-check: every gathered byte feeds the output.
    def gath_red(c, h, s):
        acc_dt = jnp.int32 if h.dtype == jnp.int8 else jnp.float32
        return h[dep(s, c)].sum(dtype=acc_dt).astype(jnp.float32)[None]

    for name, tb in tables.items():
        timeit(gath_red, (tb, s), tag=f"gather+full sum {name}")

    # 2. hyb-style chain: gather -> bf16 weights -> sum f32.
    def chain_bf16(c, h, s, w):
        msgs = h[dep(s, c)]
        return (msgs * w[..., None]).sum(axis=1, dtype=jnp.float32)

    timeit(chain_bf16, (tables["bf16"], sg, wt), tag="chain bf16 (prod ref)")

    def chain_narrow(c, h, s, w, barrier):
        msgs = h[dep(s, c)]
        if barrier:
            msgs = jax.lax.optimization_barrier(msgs)
        return (msgs.astype(jnp.bfloat16) * w[..., None]).sum(
            axis=1, dtype=jnp.float32)

    for name in ("int8", "fp8_e4m3"):
        if name not in tables:
            continue
        for barrier in (False, True):
            timeit(lambda c, h, s, w, b=barrier: chain_narrow(c, h, s, w, b),
                   (tables[name], sg, wt),
                   tag=f"chain {name} conv-after-gather barrier={barrier}")

    # 3. integer-domain chain: mask by prefix count, sum int32, scale rows.
    cnt = jnp.asarray(rng.integers(1, 17, size=R // 16, dtype=np.int64),
                      jnp.int32)

    def chain_int(c, h, s, cnt):
        msgs = h[dep(s, c)]
        live = (jax.lax.iota(jnp.int32, 16)[None, :]
                < cnt[:, None])[..., None]
        acc = jnp.where(live, msgs.astype(jnp.int32), 0).sum(axis=1)
        return acc.astype(jnp.float32) * (1.0 / 127.0)

    timeit(chain_int, (tables["int8"], sg, cnt), tag="chain int8 integer-sum")

    # 3b. integer sum without the mask (static-val analog would bake the
    # mask into int8 weights; measures the floor).
    def chain_int_nomask(c, h, s):
        return h[dep(s, c)].sum(axis=1, dtype=jnp.int32).astype(jnp.float32)

    timeit(chain_int_nomask, (tables["int8"], sg),
           tag="chain int8 integer-sum nomask")


if __name__ == "__main__":
    main()
