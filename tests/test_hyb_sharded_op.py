"""ShardedHybSpMM op-level oracle: per-shard apply/apply_dst/apply_static
and their gradients vs dense numpy, on uneven shards with pad edges.

The engine parity tests (test_hyb_sharded.py) pin end-to-end training;
this file targets the wrapper's most delicate internals directly:
  - the e2s flat-slot remap against PADDED bucket offsets (only the
    dynamic path's dval cotangent reads it),
  - dead-row padding (cross-shard max) contributing exactly zero,
  - pad-edge liveness in mask mode (apply_dst).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorylus_tpu.graph.graph import Graph
from dorylus_tpu.graph.partition import partition_graph
from dorylus_tpu.ops.hyb_sharded import ShardedHybSpMM


def _graph(v=97, e=900, classes=4, f=8, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    g = Graph(num_vertices=v, src=src, dst=dst,
              features=rng.normal(0, 1, (v, f)).astype(np.float32),
              labels=rng.integers(0, classes, v).astype(np.int32),
              num_classes=classes)
    return g.finalize()


def _shard_table(sh, s, f, rng):
    """The [local h | all ghost rows] table the sharded step feeds the op
    (vp + n*max_h rows) — random contents; the op must only read rows the
    edges reference."""
    return rng.normal(0, 1, (sh.vp + sh.n_shards * sh.max_h, f)).astype(
        np.float32)


def _dense_oracle(shard, table, val, vp):
    out = np.zeros((vp, table.shape[1]), np.float32)
    for e in range(len(shard.src)):
        out[shard.dst[e]] += val[e] * table[shard.src[e]]
    return out


@pytest.mark.parametrize("n_shards", [2, 3])
def test_sharded_hyb_apply_matches_dense(n_shards):
    g = _graph()
    sh = partition_graph(g, n_shards, method="range")
    op = ShardedHybSpMM(sh, feature_dim=8)
    rng = np.random.default_rng(0)
    for i, s in enumerate(sh.shards):
        arrs = jax.tree.map(lambda a: jnp.asarray(a[i]), op.arrays)
        table = _shard_table(sh, s, 8, rng)
        val = np.asarray(s.edge_val)
        got = np.asarray(op.apply(arrs, jnp.asarray(table),
                                  jnp.asarray(val)))
        want = _dense_oracle(s, table, val, sh.vp)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # static path: per-shard norms baked at build time
        op2 = ShardedHybSpMM(sh, feature_dim=8, static_vals=True)
        arrs2 = jax.tree.map(lambda a: jnp.asarray(a[i]), op2.arrays)
        got2 = np.asarray(op2.apply_static(arrs2, jnp.asarray(table)))
        np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_hyb_dval_gradient_matches_dense():
    """The val cotangent reads e2s (the rebuilt padded-offset map): for
    loss = sum(out * c), d loss/d val[e] = c[dst e] . table[src e]."""
    g = _graph(v=61, e=400)
    sh = partition_graph(g, 2, method="range")
    op = ShardedHybSpMM(sh, feature_dim=8)
    rng = np.random.default_rng(1)
    for i, s in enumerate(sh.shards):
        arrs = jax.tree.map(lambda a: jnp.asarray(a[i]), op.arrays)
        table = _shard_table(sh, s, 8, rng)
        val = rng.normal(0, 1, len(s.edge_val)).astype(np.float32)
        c = rng.normal(0, 1, (sh.vp, 8)).astype(np.float32)

        def loss(tb, v):
            return (op.apply(arrs, tb, v) * c).sum()

        d_tb, d_val = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(table), jnp.asarray(val))
        want_dval = np.einsum(
            "ef,ef->e", c[np.asarray(s.dst)], table[np.asarray(s.src)])
        np.testing.assert_allclose(np.asarray(d_val), want_dval,
                                   rtol=1e-4, atol=1e-4)
        want_dtb = np.zeros_like(table)
        for e in range(len(s.src)):
            want_dtb[s.src[e]] += val[e] * c[s.dst[e]]
        np.testing.assert_allclose(np.asarray(d_tb), want_dtb,
                                   rtol=1e-4, atol=1e-4)


def test_sharded_hyb_mask_liveness_kills_pad_edges():
    """apply_dst derives weights from dst_val[dst] — pad edges (dst=vp-1,
    val 0 only in the per-edge path) must be dead STRUCTURALLY."""
    g = _graph(v=50, e=301)  # odd count -> uneven pads across shards
    sh = partition_graph(g, 2, method="range")
    op = ShardedHybSpMM(sh, feature_dim=8)
    rng = np.random.default_rng(2)
    for i, s in enumerate(sh.shards):
        arrs = jax.tree.map(lambda a: jnp.asarray(a[i]), op.arrays)
        table = _shard_table(sh, s, 8, rng)
        dst_val = rng.normal(0, 1, sh.vp).astype(np.float32)
        got = np.asarray(op.apply_dst(arrs, jnp.asarray(table),
                                      jnp.asarray(dst_val)))
        nreal = s.num_edges
        want = np.zeros((sh.vp, 8), np.float32)
        for e in range(nreal):  # REAL edges only; pads must not leak
            want[s.dst[e]] += table[s.src[e]]
        want *= dst_val[:, None]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
