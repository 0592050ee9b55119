"""Large-V decomposition: where do the 289 ms of the winning variant go?

tools/probe_largev2.py found unchunked bf16 + flat segsum = 289 ms
(82.9 M edges/s) at V=1.6M E=24M F=128. The bf16 gather of ~37M slots
should cost ~115 ms at the Reddit-scale rate (325 M rows/s), so something
else eats ~170 ms. Components measured separately:
  1. gather-only over the flat slot grid (bf16)
  2. gather+scale+block-reduce (part production, no final segsum)
  3. final segment_sum over the part rows only
  4. block=8 grid (18%% fewer pad slots at avg degree 15, 2x part rows)
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan, _degree_pass  # noqa: E402

V, F = 1_600_000, 128
E = 24_000_000


def timeit(fn, args, iters=5, tag="", edges=E):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        float(loop(*args))
    except Exception as ex:  # noqa: BLE001
        print(f"{tag:44s}: FAILED {type(ex).__name__}: {str(ex)[:90]}",
              flush=True)
        return None
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
    key = jax.random.PRNGKey(0)
    hb = jax.random.normal(key, (V, F), jnp.bfloat16)
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))

    for block in (16, 8):
        p = build_degree_plan(src, dst, None, V, block, out_block_rows=0)
        p = {k: jnp.asarray(v) for k, v in p.items()}
        slots = int(p["slot_src"].size)
        r = int(p["slot_src"].shape[0])
        print(f"--- block={block}: slots={slots} R={r} ---", flush=True)

        def full(c, hh, pl, vv):
            return _degree_pass(hh * (1 + c * 1e-20), pl, V, vv,
                                gather_dtype=jnp.bfloat16)

        timeit(full, (hb, p, val), tag=f"b{block} full bf16 flat")

        def gath(c, hh, s):
            return hh[s] * (1 + c * 1e-20)

        timeit(gath, (hb, p["slot_src"]), tag=f"b{block} gather-only bf16",
               edges=slots)

        def part_only(c, hh, pl, vv):
            val_ext = jnp.concatenate([vv, jnp.zeros((1,), jnp.float32)])
            vals = val_ext[pl["slot_to_edge"]]
            msgs = (hh * (1 + c * 1e-20))[pl["slot_src"]]
            return (msgs * vals[..., None].astype(msgs.dtype)).sum(
                axis=1, dtype=jnp.float32)

        timeit(part_only, (hb, p, val), tag=f"b{block} gather+reduce (part)")

        part = jax.random.normal(key, (r, F), jnp.float32)

        def seg_only(c, pt, br):
            return jax.ops.segment_sum(pt * (1 + c * 1e-20), br,
                                       num_segments=V,
                                       indices_are_sorted=True)

        timeit(seg_only, (part, p["block_row"]), tag=f"b{block} segsum-only")
        del p, part


if __name__ == "__main__":
    main()
