"""Measure the production HybSpMM vs DegreeSpMM at Reddit shape (TPU).

Covers both degree regimes (uniform Poisson(50) — the bench graph — and
Zipf(1.6) power-law), static-vals forward (the GCN headline), fwd+bwd,
and the dst-functional pair (GAT), plus each kernel's own gather bound.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import DegreeSpMM, spmm_degree  # noqa: E402
from dorylus_tpu.ops.hyb_spmm import HybSpMM, spmm_hyb  # noqa: E402

V, F = 232_965, 128


def timeit(fn, args, iters=10, tag="", edges=1):
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
    print(f"{tag:54s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def run(tag, src, dst, e):
    rng = np.random.default_rng(1)
    val = (rng.random(e).astype(np.float32) + 0.1) * 1e-2
    h = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)
    dstv = jnp.asarray(rng.normal(0, 1, V).astype(np.float32))
    print(f"\n--- {tag}: V={V} E={e} ---", flush=True)

    hops = HybSpMM(src, dst, V, V, gather_dtype=jnp.bfloat16,
                   feature_dim=F, static_val=val)
    dops = DegreeSpMM(src, dst, V, V, block=16, gather_dtype=jnp.bfloat16,
                      feature_dim=F, static_val=val)
    fwdp = hops.arrays["fwd"]
    n_fwd_slots = sum(b["rows"].size for b in fwdp["buckets"]) + (
        fwdp["top"]["rows"].size if fwdp["top"] is not None else 0)
    print(f"  hyb: buckets={len(fwdp['buckets'])} "
          f"top={'yes' if fwdp['top'] is not None else 'no'} "
          f"fwd slots={n_fwd_slots/1e6:.2f}M pad={n_fwd_slots/e-1:.1%}")

    # Gather bound on the hyb fwd slot arrays.
    def bound(c, h, *rows):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for s in rows:
            acc = acc + hb[s].ravel()[3].astype(jnp.float32)
        return jnp.reshape(acc, (1,))

    rows = [b["rows"] for b in fwdp["buckets"]]
    if fwdp["top"] is not None:
        rows.append(fwdp["top"]["rows"])
    dt_b = timeit(bound, (h, *rows), tag="  hyb gather bound", edges=e)

    dt_h = timeit(lambda c, h, p: spmm_hyb(h * (1 + c * 1e-20), p, V,
                                           jnp.bfloat16),
                  (h, fwdp), tag="  hyb static fwd", edges=e)
    print(f"    -> fraction_of_gather_bound = {dt_b/dt_h:.3f}", flush=True)

    timeit(lambda c, h, p: spmm_degree(h * (1 + c * 1e-20), p, V, None,
                                       gather_dtype=jnp.bfloat16),
           (h, dops.arrays["fwd"]), tag="  degree static fwd", edges=e)

    # fwd+bwd through the custom VJPs (data-dependent cotangent).
    def loss_h(c, arrs, hh):
        def f(x):
            return (hops.apply_static(arrs, x) ** 2).sum()
        return jax.grad(f)(hh * (1 + c * 1e-20))

    def loss_d(c, arrs, hh):
        def f(x):
            return (dops.apply_static(arrs, x) ** 2).sum()
        return jax.grad(f)(hh * (1 + c * 1e-20))

    timeit(loss_h, (hops.arrays, h), tag="  hyb static fwd+dh", edges=e)
    timeit(loss_d, (dops.arrays, h), tag="  degree static fwd+dh", edges=e)

    # GAT pair: dst-functional fwd + both grads.
    def gat_h(c, arrs, hh, dv):
        def f(x, a):
            return (hops.apply_dst(arrs, x, a) ** 2).sum()
        return jax.grad(f, argnums=0)(hh * (1 + c * 1e-20), dv)

    def gat_d(c, arrs, hh, dv):
        def f(x, a):
            return (dops.apply_dst(arrs, x, a) ** 2).sum()
        return jax.grad(f, argnums=0)(hh * (1 + c * 1e-20), dv)

    timeit(gat_h, (hops.arrays, h, dstv), tag="  hyb dst fwd+dh", edges=e)
    timeit(gat_d, (dops.arrays, h, dstv), tag="  degree dst fwd+dh", edges=e)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    E = V * 50
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    run("uniform Poisson(50)", src, dst, E)

    raw = np.minimum(rng.zipf(1.6, V).astype(np.int64), 200_000)
    deg = np.maximum((raw * (E / raw.sum())).astype(np.int64), 0)
    e_pl = int(deg.sum())
    dst_p = np.repeat(np.arange(V, dtype=np.int32), deg)
    src_p = rng.integers(0, V, e_pl).astype(np.int32)
    run("power-law Zipf(1.6)", src_p, dst_p, e_pl)


if __name__ == "__main__":
    main()
