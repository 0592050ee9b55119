"""Pin the fast-gather trigger and exploit it inside the degree kernel.

probe_gather_bigmode.py: tables >~2^31 bytes gather at ~500 M rows/s (a
DMA/copy-based lowering — the OOM dump shows copy-start/kCustom fusions)
vs 141 M rows/s below; indices confined to a small corner keep the fast
rate. Hypothesis: the trigger is operand BYTES > 2^31. If padding the
table into the fast regime survives inside the fused degree kernel, the
large-V aggregation gets ~3x.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan, _degree_pass  # noqa: E402

N = 12_000_000
F = 128


def timeit(fn, args, iters=10, tag="", rows=N):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        float(loop(*args))
    except Exception as ex:  # noqa: BLE001
        print(f"{tag:52s}: FAILED {type(ex).__name__}: {str(ex)[:70]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:52s}: {dt*1e3:9.3f} ms  {rows/dt/1e6:7.1f} M rows/s",
          flush=True)
    return dt


def gath(c, h, s):
    return h[s] * (1 + c * 1e-20)


def main():
    # 1. Byte-boundary bisect at F=128 bf16 (256 B/row; 2^31 B = 8388608
    #    rows exactly).
    for v in (8_388_608, 8_388_616, 9_000_000):
        k1, k2 = jax.random.split(jax.random.PRNGKey(v))
        h = jax.random.normal(k1, (v, F), jnp.bfloat16)
        s = jax.random.randint(k2, (N,), 0, v, jnp.int32)
        timeit(gath, (h, s), tag=f"rows={v} ({v*F*2} B)")
        del h, s
    # 2. Same bytes via width: 1.6M rows x F=704 bf16 = 2.25 GB.
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    h = jax.random.normal(k1, (1_600_000, 704), jnp.bfloat16)
    s = jax.random.randint(k2, (N,), 0, 1_600_000, jnp.int32)
    timeit(gath, (h, s), tag="rows=1.6M F=704 (2.25 GB)")
    del h, s

    # 3. Inside the real degree kernel at large V: pad the table rows
    #    inside the jitted pass so the gather operand crosses 2^31 bytes.
    V, E = 1_600_000, 24_000_000
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    p = build_degree_plan(src, dst, None, V, 16, out_block_rows=0)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    hb = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.bfloat16)
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))

    def full(c, hh, pl, vv, pad_to=0):
        hh = hh * (1 + c * 1e-20)
        if pad_to:
            hh = jnp.pad(hh, ((0, pad_to - hh.shape[0]), (0, 0)))
        return _degree_pass(hh, pl, V, vv, gather_dtype=jnp.bfloat16)

    timeit(lambda c, hh, pl, vv: full(c, hh, pl, vv, 0), (hb, p, val),
           tag="degree V=1.6M bf16 (table 0.41 GB)", rows=E, iters=5)
    timeit(lambda c, hh, pl, vv: full(c, hh, pl, vv, 8_500_000), (hb, p, val),
           tag="degree V=1.6M bf16 table padded to 2.18 GB", rows=E, iters=5)


if __name__ == "__main__":
    main()
