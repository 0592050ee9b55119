"""Test the out_rows <= table_rows hypothesis for the fast gather.

Every fast case so far had index count N <= table rows (12M idx from
12M/16.7M/20M-row tables: 498 M rows/s); every slow case had N > rows
(12M idx from 1M..9M rows: 141 M rows/s; from 65k/262k rows: 328 M).
If the trigger is N <= rows, CHUNKING the indices so each gather's output
fits under the table height should unlock ~500 M rows/s for any table.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

F = 128


def timeit(fn, args, iters=10, tag="", rows=0):
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
    # 1. N vs rows matrix.
    for n, v in ((6_000_000, 9_000_000), (12_000_000, 11_000_000),
                 (1_500_000, 1_600_000), (12_000_000, 12_000_000)):
        k1, k2 = jax.random.split(jax.random.PRNGKey(v + n))
        h = jax.random.normal(k1, (v, F), jnp.bfloat16)
        s = jax.random.randint(k2, (n,), 0, v, jnp.int32)
        timeit(gath, (h, s), tag=f"N={n/1e6:g}M rows={v/1e6:g}M", rows=n)
        del h, s

    # 2. Chunked gather: 12M idx from a 1.6M-row table, chunks of 1.5M —
    #    unrolled (8 gather ops) and scanned.
    v, n, ch = 1_600_000, 12_000_000, 1_500_000
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    h = jax.random.normal(k1, (v, F), jnp.bfloat16)
    s = jax.random.randint(k2, (n,), 0, v, jnp.int32)
    timeit(gath, (h, s), tag="12M from 1.6M flat (slow ref)", rows=n)

    def gath_unroll(c, h, s):
        # Per-chunk full column-reduction so no chunk can be DCE'd.
        hh = h * (1 + c * 1e-20)
        outs = [hh[s[i * ch:(i + 1) * ch]].sum(axis=0, dtype=jnp.float32)
                for i in range(n // ch)]
        return sum(outs)

    timeit(gath_unroll, (h, s), tag="12M from 1.6M unrolled 8x1.5M", rows=n)

    def gath_scan(c, h, s):
        hh = h * (1 + c * 1e-20)
        sc = s.reshape(n // ch, ch)

        def body(_, idx):
            return None, hh[idx].sum(axis=0, dtype=jnp.float32)

        _, outs = jax.lax.scan(body, None, sc)
        return outs.sum(0)

    timeit(gath_scan, (h, s), tag="12M from 1.6M scanned 8x1.5M", rows=n)


if __name__ == "__main__":
    main()
