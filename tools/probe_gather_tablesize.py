"""Gather rate vs TABLE size (bf16, fixed 12M random rows, F=128).

tools/probe_roofline.py showed the gather is index-pattern-independent at
a fixed table size; tools/probe_largev3.py implied the RATE degrades with
table size (325 M rows/s from a 60 MB table vs ~128 M rows/s from a
410 MB one). This pins the curve — the remaining lever for large-V
aggregation is therefore SHARDING (smaller per-chip tables), not index
locality.
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
    print(f"{tag:36s}: {dt*1e3:9.3f} ms  {rows/dt/1e6:7.1f} M rows/s  "
          f"{rows*F*2/dt/1e9:6.1f} GB/s", flush=True)
    return dt


def gath(c, h, s):
    return h[s] * (1 + c * 1e-20)


def main():
    key = jax.random.PRNGKey(0)
    for v in (65_536, 262_144, 1_048_576, 4_194_304, 16_777_216):
        k1, k2 = jax.random.split(jax.random.PRNGKey(v))
        h = jax.random.normal(k1, (v, F), jnp.bfloat16)
        s = jax.random.randint(k2, (N,), 0, v, jnp.int32)
        mb = v * F * 2 >> 20
        timeit(gath, (h, s), tag=f"table {v:>9d} rows ({mb:>5d} MB)")
        del h, s


if __name__ == "__main__":
    main()
