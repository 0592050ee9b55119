"""Decompose the GAT layer at Reddit config (V=233k, E=11.6M, F=128).

bench r2: GAT epoch 1261 ms (bf16 agg) vs GCN 224 ms; profile says
forward 462 ms / loss+grad 1022 ms while the isolated degree GAT
fwd+bwd probe is ~216 ms. Which GAT-layer piece eats the difference?
  a. degree apply, att precomputed        (expected ~62 ms bf16)
  b. att = leaky(take_sorted(za,dst))*mask then degree apply
  c. full GAT layer: z = hW; za = z@a; att; agg; z+agg
  d. (c) with value_and_grad (one layer)
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import DegreeSpMM  # noqa: E402
from dorylus_tpu.ops.spmm import take_sorted  # noqa: E402
from dorylus_tpu.ops.activations import leaky_relu  # noqa: E402

V, F = 232_965, 128
E = V * 50


def timeit(fn, args, iters=5, tag=""):
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
    print(f"{tag:44s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    op = DegreeSpMM(src, dst, V, V, block=16, gather_dtype=jnp.bfloat16,
                    feature_dim=F)
    arrs = op.arrays
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (V, F), jnp.float32)
    w = jax.random.normal(key, (F, F), jnp.float32) * 0.05
    a = jax.random.normal(key, (F, 1), jnp.float32) * 0.05
    att0 = jnp.abs(jax.random.normal(key, (E,), jnp.float32)) * 1e-2
    dj = jnp.asarray(dst)
    mask = jnp.ones((E,), jnp.float32)

    timeit(lambda c, arrs, h, v: op.apply(arrs, h * (1 + c * 1e-20), v),
           (arrs, h, att0), tag="a. degree apply, att precomputed")

    def with_att(c, arrs, h, d, m):
        hh = h * (1 + c * 1e-20)
        za = jnp.dot(hh, a, preferred_element_type=jnp.float32)[:, 0]
        att = leaky_relu(take_sorted(za, d, V)) * m
        return op.apply(arrs, hh, att)

    timeit(with_att, (arrs, h, dj, mask), tag="b. att from za + degree apply")

    def layer(c, arrs, h, d, m):
        hh = h * (1 + c * 1e-20)
        z = jnp.dot(hh, w, preferred_element_type=jnp.float32)
        za = jnp.dot(z, a, preferred_element_type=jnp.float32)[:, 0]
        att = leaky_relu(take_sorted(za, d, V)) * m
        return z + op.apply(arrs, z, att)

    timeit(layer, (arrs, h, dj, mask), tag="c. full GAT layer fwd")

    def layer_grad(c, arrs, h, d, m):
        def loss(hh):
            out = layer(c, arrs, hh, d, m)
            return (out * out).sum()
        return jax.grad(loss)(h)

    timeit(layer_grad, (arrs, h, dj, mask), tag="d. full GAT layer fwd+bwd")


if __name__ == "__main__":
    main()
