"""TPU probe: row_chunk cost/benefit for the degree kernel.

The unchunked pass lets XLA materialize the (slots, F) message tensor:
17.5 GB at V=1.6M E=24M (OOM), 6.9 GB at Reddit scale (fits, fast).
Measures the scan-chunked variant at both scales to pick the auto
threshold.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dorylus_tpu.ops.degree_spmm import DegreeSpMM


def timeit(fn, args, e, iters=5, tag=""):
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
    print(f"{tag:48s}: {dt*1e3:9.3f} ms  {e/dt/1e6:8.1f} M edges/s",
          flush=True)
    return dt


def run(v, deg, f, chunks):
    e = v * deg
    print(f"--- V={v} E={e} F={f}", flush=True)
    rng = np.random.default_rng(0)
    src = rng.integers(0, v, size=e).astype(np.int32)
    dst = np.sort(rng.integers(0, v, size=e).astype(np.int32))
    h = jnp.asarray(rng.normal(0, 1, size=(v, f)).astype(np.float32))
    val = jnp.asarray((rng.normal(0, 1, size=e) * 1e-3).astype(np.float32))

    for rc in chunks:
        t0 = time.perf_counter()
        op = DegreeSpMM(src, dst, v, v, block=16, row_chunk=rc)
        print(f"  plan build: {time.perf_counter()-t0:.1f}s  rc={rc} "
              f"obr={op.static[4]}", flush=True)

        def fwd(c, arrs, hh, vv):
            return op.apply(arrs, hh + c * 1e-20, vv)

        timeit(fwd, (op.arrays, h, val), e, tag=f"degree rc={rc} fwd")

        def gh(c, arrs, hh, vv):
            return jax.grad(lambda x: (op.apply(arrs, x, vv) ** 2).sum())(
                hh + c * 1e-20)

        timeit(gh, (op.arrays, h, val), e, tag=f"degree rc={rc} fwd+dh")
        del op


def main():
    run(232_965, 50, 128, chunks=[0, 1 << 18])
    run(1_600_000, 15, 128, chunks=[1 << 18])


if __name__ == "__main__":
    main()
