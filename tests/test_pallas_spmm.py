"""Pallas chunk-chain SpMM correctness vs dense references.

Runs in interpreter mode on CPU (hermetic); the same kernels compile for
TPU (exercised by tools/bench_pallas.py and bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorylus_tpu.ops.pallas_spmm import PallasSpMM, build_chain_plan


def make_graph(v_in, v_out, e, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        blocks = max(1, v_in // 64)
        b = rng.integers(0, blocks, e)
        src = (b * 64 + rng.integers(0, 64, e)) % v_in
        dst = (b * (v_out // max(1, blocks)) + rng.integers(0, max(1, v_out // blocks), e)) % v_out
    else:
        src = rng.integers(0, v_in, e)
        dst = rng.integers(0, v_out, e)
    val = rng.normal(size=e).astype(np.float32)
    return src.astype(np.int64), dst.astype(np.int64), val


def dense_spmm(src, dst, val, h, v_out):
    out = np.zeros((v_out, h.shape[1]), np.float64)
    np.add.at(out, dst, val[:, None] * h[src].astype(np.float64))
    return out


def test_chain_plan_invariants():
    src, dst, val = make_graph(500, 300, 4000, seed=1)
    plan = build_chain_plan(src, dst, 500, 300)
    # every edge has exactly one slot
    assert len(np.unique(plan.edge_slot)) == 4000
    # real finals target valid vertices; padding routes to the dropped row
    real = plan.final_dst[plan.final_dst < 300]
    assert real.size > 0
    # the stage chain compresses
    assert len(plan.final_dst) <= 4000


@pytest.mark.parametrize("v_in,v_out,e,f,clustered", [
    (300, 300, 2000, 16, False),
    (100, 500, 3000, 130, False),
    (700, 300, 1500, 64, True),
    (1000, 1000, 20000, 128, True),
])
def test_forward_matches_dense(v_in, v_out, e, f, clustered):
    src, dst, val = make_graph(v_in, v_out, e, seed=2, clustered=clustered)
    rng = np.random.default_rng(1)
    h = rng.normal(size=(v_in, f)).astype(np.float32)
    op = PallasSpMM(src, dst, v_in, v_out, interpret=True)
    out = op(jnp.asarray(h), jnp.asarray(val))
    want = dense_spmm(src, dst, val, h, v_out)
    assert out.shape == (v_out, f)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=1e-3)


def test_gradients_match_segment_sum():
    v, e, f = 400, 3000, 32
    src, dst, val = make_graph(v, v, e, seed=3)
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(v, f)).astype(np.float32))
    vj = jnp.asarray(val)
    op = PallasSpMM(src, dst, v, v, interpret=True)

    sj, dj = jnp.asarray(src.astype(np.int32)), jnp.asarray(dst.astype(np.int32))

    def ref(h, val):
        return jax.ops.segment_sum(h[sj] * val[:, None], dj, num_segments=v)

    co = jnp.asarray(rng.normal(size=(v, f)).astype(np.float32))

    g_p = jax.grad(lambda a, b: jnp.sum(op(a, b) * co), argnums=(0, 1))(h, vj)
    g_r = jax.grad(lambda a, b: jnp.sum(ref(a, b) * co), argnums=(0, 1))(h, vj)
    np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_r[0]), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_p[1]), np.asarray(g_r[1]), rtol=2e-4, atol=1e-3)


def test_empty_rows_and_high_degree():
    """Vertices with no in-edges stay zero; one hub vertex with deg >> 128
    exercises multi-chunk runs and the chain reduction."""
    v, f = 600, 16
    rng = np.random.default_rng(5)
    hub_src = rng.integers(0, v, 1000)
    src = np.r_[hub_src, rng.integers(0, v, 500)]
    dst = np.r_[np.full(1000, 7), rng.integers(100, 200, 500)]
    val = rng.normal(size=1500).astype(np.float32)
    h = rng.normal(size=(v, f)).astype(np.float32)
    op = PallasSpMM(src, dst, v, v, interpret=True)
    out = np.asarray(op(jnp.asarray(h), jnp.asarray(val)))
    want = dense_spmm(src, dst, val, h, v)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-3)
    assert np.allclose(out[300:], 0.0)
