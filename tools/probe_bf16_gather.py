"""Verify the bf16-native degree-kernel path and crack the large-V regime.

Follows tools/probe_roofline.py's finding: the TPU gather is byte-rate-bound
(~85 GB/s, pattern-independent), so a bf16 gather table should halve
aggregation time — IF the convert stays out of the gather (degree_spmm
narrow mode). Measures, on the real chip:
  1. Reddit shape (V=233k, E=11.6M, F=128): fwd, GCN fwd+bwd, GAT fwd+bwd
     at gather_dtype None vs bf16.
  2. Large-V (V=1.6M, E=24M, F=128 — the regime VERDICT r1 flagged as
     having no winning kernel): degree f32/bf16 vs edgewise.
Cotangents are data-dependent ((out**2).sum) per CLAUDE.md.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import DegreeSpMM  # noqa: E402
from dorylus_tpu.ops.spmm import spmm_edgewise  # noqa: E402

F = 128


def timeit(fn, args, iters=5, tag="", edges=None):
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
    msg = f"{tag:40s}: {dt*1e3:9.3f} ms"
    if edges:
        msg += f"  {edges/dt/1e6:7.1f} M edges/s"
    print(msg, flush=True)
    return dt


def suite(V, E, tag):
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (V, F), jnp.float32)
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))
    print(f"--- {tag}: V={V} E={E} F={F} ---", flush=True)

    for gd, name in ((None, "f32"), (jnp.bfloat16, "bf16")):
        op = DegreeSpMM(src, dst, V, V, block=16, gather_dtype=gd,
                        feature_dim=F)
        arrs = op.arrays

        def fwd(c, arrs, h, val):
            return op.apply(arrs, h * (1 + c * 1e-20), val)

        timeit(fwd, (arrs, h, val), tag=f"degree {name} fwd", edges=E)

        def gcn_bwd(c, arrs, h, val):
            def loss(hh):
                o = op.apply(arrs, hh, val)
                return (o * o).sum()
            return jax.grad(loss)(h * (1 + c * 1e-20))

        timeit(gcn_bwd, (arrs, h, val), tag=f"degree {name} GCN fwd+dh", edges=E)

        def gat_bwd(c, arrs, h, val):
            def loss(hh, vv):
                o = op.apply(arrs, hh, vv)
                return (o * o).sum()
            gh, gv = jax.grad(loss, argnums=(0, 1))(h * (1 + c * 1e-20), val)
            return gh * (1 + gv[3])

        timeit(gat_bwd, (arrs, h, val), tag=f"degree {name} GAT fwd+dh+dval",
               edges=E)
        del op, arrs

    sj, dj = jnp.asarray(src), jnp.asarray(dst)

    def ew(c, h, s, d, v):
        return spmm_edgewise(h * (1 + c * 1e-20), s, d, v, V, sorted_dst=True)

    timeit(ew, (h, sj, dj, val), tag="edgewise f32 fwd", edges=E)


def main():
    suite(232_965, 232_965 * 50, "reddit-shape")
    suite(1_600_000, 24_000_000, "large-V")


if __name__ == "__main__":
    main()
