"""Microbenchmark SpMM formulations on the attached device.

Methodology: N iterations inside one jit via lax.fori_loop with a carried
dependency, so remote-dispatch overhead is amortized and timing reflects
device execution.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, args, n=20, tag=""):
    @jax.jit
    def loop(h, *rest):
        def body(i, x):
            return fn(x, *rest)
        return jax.lax.fori_loop(0, n, body, h)

    out = loop(*args)
    float(out.ravel()[0])  # compile + warmup; block_until_ready does not
    t = time.perf_counter()  # actually sync on the axon tunnel backend,
    out = loop(*args)  # so force a host transfer instead
    float(out.ravel()[0])
    dt = (time.perf_counter() - t) / n
    return dt


def main():
    rng = np.random.default_rng(0)
    V, F = 232_965, 128
    DEG = 50
    E = V * DEG
    src = rng.integers(0, V, E).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    val = (rng.normal(size=E) * 1e-3).astype(np.float32)
    h = rng.normal(size=(V, F)).astype(np.float32)

    hj = jnp.asarray(h)
    sj, dj, vj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val)

    # 1. sorted segment_sum (scatter-add)
    def seg(h, s, d, v):
        msgs = h[s] * v[:, None]
        return jax.ops.segment_sum(msgs, d, num_segments=V, indices_are_sorted=True)

    dt = bench(seg, (hj, sj, dj, vj), n=10)
    print(f"segment_sum sorted : {dt*1e3:8.2f} ms  {E/dt/1e6:8.1f} M edges/s "
          f"{E*F*4/dt/1e9:6.1f} GB/s", flush=True)

    # 2. ELL gather loop (pad each vertex to K neighbors, K-loop of row gathers)
    K = DEG * 2  # uniform random: max deg ~ 2x mean w/ tail clipped
    counts = np.bincount(dst, minlength=V)
    Kmax = int(counts.max())
    K = Kmax
    idx_ell = np.zeros((V, K), np.int32)
    val_ell = np.zeros((V, K), np.float32)
    ptr = np.zeros(V + 1, np.int64)
    np.cumsum(counts, out=ptr[1:])
    for v_ in range(V):
        d0, d1 = ptr[v_], ptr[v_ + 1]
        idx_ell[v_, : d1 - d0] = src[d0:d1]
        val_ell[v_, : d1 - d0] = val[d0:d1]
    ij = jnp.asarray(idx_ell)
    wj = jnp.asarray(val_ell)
    print(f"ELL K={K} pad waste {V*K/E:.2f}x", flush=True)

    def ell(h, idx, w):
        def body(k, acc):
            return acc + h[idx[:, k]] * w[:, k][:, None]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((V, F), h.dtype))

    dt = bench(ell, (hj, ij, wj), n=5)
    print(f"ELL gather loop    : {dt*1e3:8.2f} ms  {E/dt/1e6:8.1f} M edges/s "
          f"{V*K*F*4/dt/1e9:6.1f} GB/s(padded)", flush=True)

    # 3. dense one-hot matmul reference point (tiny V only) — skipped at scale

    # 4. pure row gather (lower bound on any per-edge-read scheme), 2M rows
    M = 2_000_000
    sj2 = sj[:M]

    def gath(h, s):
        g = h[s]  # (M, F)
        return h + g.sum(axis=0)[None, :] * 1e-9

    dt = bench(gath, (hj, sj2), n=5)
    print(f"row gather only    : {dt*1e3:8.2f} ms  {M/dt/1e6:8.1f} M rows/s "
          f"{M*F*4/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
