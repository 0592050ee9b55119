"""Chase the fast-gather regime found in probe_gather_tablesize.py.

Observed (bf16, F=128, 12M random rows): tables of 256 MB-1 GB gather at
141 M rows/s, but a 4 GB (2^24-row) table gathers at 498 M rows/s. Is the
switch driven by table ROW COUNT, BYTES, or index range? If padding a
table into the fast regime works with indices confined to the real rows,
large-V aggregation gets ~3.5x for free.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 12_000_000
F = 128


def timeit(fn, args, iters=10, tag="", rows=N):
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
    print(f"{tag:44s}: {dt*1e3:9.3f} ms  {rows/dt/1e6:7.1f} M rows/s",
          flush=True)
    return dt


def gath(c, h, s):
    return h[s] * (1 + c * 1e-20)


def main():
    # 1. Row-count boundary at fixed F=128 (bytes = rows * 256).
    for v in (6_000_000, 8_388_608, 12_000_000, 16_777_216, 20_000_000):
        k1, k2 = jax.random.split(jax.random.PRNGKey(v))
        h = jax.random.normal(k1, (v, F), jnp.bfloat16)
        s = jax.random.randint(k2, (N,), 0, v, jnp.int32)
        timeit(gath, (h, s), tag=f"rows={v:>9d} ({v*F*2>>20} MB) idx full")
        del h, s
    # 2. Index range confined to the first 1.6M rows of a big table —
    #    does the fast mode survive when only a corner is touched?
    for v in (1_600_000, 16_777_216):
        k1, k2 = jax.random.split(jax.random.PRNGKey(v + 7))
        h = jax.random.normal(k1, (v, F), jnp.bfloat16)
        s = jax.random.randint(k2, (N,), 0, 1_600_000, jnp.int32)
        timeit(gath, (h, s), tag=f"rows={v:>9d} idx<1.6M")
        del h, s
    # 3. f32 in the fast regime (is it dtype-sensitive?)
    k1, k2 = jax.random.split(jax.random.PRNGKey(99))
    h = jax.random.normal(k1, (16_777_216, 64), jnp.float32)  # 4 GB f32
    s = jax.random.randint(k2, (N,), 0, 16_777_216, jnp.int32)
    timeit(gath, (h, s), tag="rows= 16777216 f32 F=64 (4GB)")
    del h, s
    # 4. Narrower rows in the fast regime (F=64 bf16: 2 GB at 2^24 rows).
    k1, k2 = jax.random.split(jax.random.PRNGKey(123))
    h = jax.random.normal(k1, (16_777_216, 64), jnp.bfloat16)
    s = jax.random.randint(k2, (N,), 0, 16_777_216, jnp.int32)
    timeit(gath, (h, s), tag="rows= 16777216 bf16 F=64 (2GB)")


if __name__ == "__main__":
    main()
