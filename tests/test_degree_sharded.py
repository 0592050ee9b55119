"""Sharded degree-padded SpMM: uniform per-shard plans must reproduce the
XLA sharded path exactly on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.graph.graph import synthetic_graph
from dorylus_tpu.parallel.mesh import make_mesh
from dorylus_tpu.parallel.train_step import ShardedEngine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (virtual CPU mesh)")


def test_sharded_degree_matches_xla():
    g = synthetic_graph(300, 6, 16, 4, seed=91)
    layers = LayerConfig([16, 8, 4])
    r_x = ShardedEngine(g, layers, TrainConfig(epochs=3, eval_every=0),
                        mesh=make_mesh(4)).run()
    r_d = ShardedEngine(g, layers, TrainConfig(epochs=3, eval_every=0,
                                               kernel="degree"),
                        mesh=make_mesh(4)).run()
    for a, b in zip(r_x.epochs, r_d.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=1e-3, atol=1e-6)


def test_sharded_degree_gat():
    g = synthetic_graph(200, 5, 12, 3, seed=93)
    layers = LayerConfig([12, 6, 3])
    cfg = dict(model="gat", epochs=2, eval_every=0, learning_rate=0.003)
    r_x = ShardedEngine(g, layers, TrainConfig(**cfg), mesh=make_mesh(4)).run()
    r_d = ShardedEngine(g, layers, TrainConfig(**cfg, kernel="degree"),
                        mesh=make_mesh(4)).run()
    for a, b in zip(r_x.epochs, r_d.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_sharded_degree_gat_50k():
    """GAT + degree kernel sharded at a realistic vertex count (round-1
    gap: the Reddit-config GAT compile blowup was only caught at full
    scale; this pins GAT+degree sharded at >=50k vertices in the hermetic
    suite)."""
    g = synthetic_graph(50_000, 8, 32, 8, seed=97)
    layers = LayerConfig([32, 16, 8])
    cfg = dict(model="gat", epochs=2, eval_every=0, learning_rate=0.003)
    r_x = ShardedEngine(g, layers, TrainConfig(**cfg), mesh=make_mesh(4)).run()
    r_d = ShardedEngine(g, layers, TrainConfig(**cfg, kernel="degree"),
                        mesh=make_mesh(4)).run()
    for a, b in zip(r_x.epochs, r_d.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=2e-3, atol=1e-6)
    assert r_d.epochs[-1].loss < r_d.epochs[0].loss


import pytest


@pytest.mark.parametrize("model", ["gcn", "gat"])
def test_sharded_degree_uneven_shards(model):
    """Vertex count not divisible by shards -> padded vp rows, pad edges
    and uneven per-shard block-row counts exercise the uniform-R padding
    (and, for GAT, the apply_dst live masks that keep pad edges dead)."""
    g = synthetic_graph(311, 7, 16, 4, seed=95)
    layers = LayerConfig([16, 8, 4])
    cfg = dict(model=model, epochs=2, eval_every=0,
               learning_rate=0.003 if model == "gat" else 0.01)
    r_x = ShardedEngine(g, layers, TrainConfig(**cfg),
                        mesh=make_mesh(8)).run()
    r_d = ShardedEngine(g, layers, TrainConfig(**cfg, kernel="degree"),
                        mesh=make_mesh(8)).run()
    for a, b in zip(r_x.epochs, r_d.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=2e-3, atol=1e-6)


def test_sharded_degree_bf16_close_to_f32():
    """agg_dtype=bfloat16 on the SHARDED degree path: loss trajectory must
    track the f32 path within bf16 mantissa error, and still train."""
    g = synthetic_graph(2000, 8, 16, 5, seed=21)
    layers = LayerConfig([16, 8, 5])
    base = dict(epochs=4, eval_every=0, kernel="degree")
    r_32 = ShardedEngine(g, layers, TrainConfig(**base),
                         mesh=make_mesh(4)).run()
    r_16 = ShardedEngine(g, layers, TrainConfig(**base, agg_dtype="bfloat16"),
                         mesh=make_mesh(4)).run()
    for a, b in zip(r_32.epochs, r_16.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=3e-2, atol=1e-3)
    assert r_16.epochs[-1].loss < r_16.epochs[0].loss


def test_sharded_degree_blocked_output_matches_unblocked(monkeypatch):
    """Round-5 review: the sharded wrapper hardcoded out_block_rows=0,
    silently re-paying the large-V segment_sum collapse the blocking
    exists to prevent (the bwd plan's output is the vp + n*max_h TABLE,
    which crosses the cliff before vp does). Force the cliff low and
    check the blocked plans (multi-block, padded per shard) match the
    unblocked ones exactly — forward and gradient."""
    import jax
    import jax.numpy as jnp

    import dorylus_tpu.ops.degree_spmm as dsp
    from dorylus_tpu.graph.graph import clustered_synthetic_graph
    from dorylus_tpu.graph.partition import partition_graph
    from dorylus_tpu.ops.degree_sharded import ShardedDegreeSpMM

    g = clustered_synthetic_graph(900, 8, 12, 5, seed=3, window=128,
                                  cut=0.25)
    sg = partition_graph(g, 4, method="hash")
    plain = ShardedDegreeSpMM(sg, block=8, static_vals=True)
    assert plain.static[4] == 0 and plain.static[5] == 0
    monkeypatch.setattr(dsp, "_OUT_BLOCK_AUTO_V", 64)
    blocked = ShardedDegreeSpMM(sg, block=8, static_vals=True,
                                out_block_rows=64)
    assert blocked.static[4] == 64 and blocked.static[5] == 64
    assert "out_idx" in blocked.arrays["fwd"]
    rng = np.random.default_rng(5)
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    for s in range(n):
        tab = jnp.asarray(rng.normal(
            size=(vp + n * mh, 6)).astype(np.float32))
        pa = jax.tree.map(lambda v: v[s], plain.arrays)
        ba = jax.tree.map(lambda v: v[s], blocked.arrays)
        np.testing.assert_allclose(
            np.asarray(blocked.apply_static(ba, tab)),
            np.asarray(plain.apply_static(pa, tab)), rtol=1e-5, atol=1e-5)
        gb = jax.grad(lambda t: (blocked.apply_static(ba, t) ** 2).sum())(tab)
        gp = jax.grad(lambda t: (plain.apply_static(pa, t) ** 2).sum())(tab)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gp),
                                   rtol=1e-4, atol=1e-4)
