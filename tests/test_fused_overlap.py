"""Fused overlap plan (ops/hyb_sharded.py edges="fused", round 5):
ONE hyb plan whose pure buckets gather local rows (no halo dependency)
and mixed buckets + hub top gather the (local ‖ ghost) table. Must equal
the combined plan exactly — forward, both gradients, all three apply
flavors, hub spill, bf16 tables — and the engine must train the same
trajectory as single-device. Replaces the round-4 two-plan split
(interior/boundary) for the hyb kernel. Reference semantics:
gcn_ops.cpp:130-191 aggregation under the pipeline.cpp:256-286 overlap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorylus_tpu.graph.graph import clustered_synthetic_graph
from dorylus_tpu.graph.partition import partition_graph
from dorylus_tpu.ops.hyb_sharded import ShardedHybSpMM

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (virtual CPU mesh)")


def _shard_view(arrays, s):
    return jax.tree.map(lambda v: v[s], arrays)


@pytest.fixture(scope="module", params=["gcn", "gat"])
def ops(request):
    static_vals = request.param == "gcn"
    g = clustered_synthetic_graph(1200, 10, 16, 5, seed=7, window=128,
                                  cut=0.2)
    sg = partition_graph(g, 4, method="hash",  # hash: heavy cut, hubs mix
                         for_gat=not static_vals)
    # max_width small so hub top buckets exist and are forced mixed.
    fused = ShardedHybSpMM(sg, max_width=16, lam_slots=8,
                           static_vals=static_vals, edges="fused",
                           dynamic=False)
    comb = ShardedHybSpMM(sg, max_width=16, lam_slots=8,
                          static_vals=static_vals, edges="combined",
                          dynamic=False)
    assert fused.fused and fused.n_pure > 0
    assert fused.arrays["fwd"]["top"] is not None, "want hub coverage"
    return sg, fused, comb, static_vals


def test_fused_matches_combined_forward_and_grads(ops):
    sg, fused, comb, static_vals = ops
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    rng = np.random.default_rng(3)
    for s in range(n):
        h = jnp.asarray(rng.normal(size=(vp, 6)).astype(np.float32))
        gh = jnp.asarray(rng.normal(size=(n * mh, 6)).astype(np.float32))
        fa = _shard_view(fused.arrays, s)
        ca = _shard_view(comb.arrays, s)
        table = jnp.concatenate([h, gh], axis=0)
        if static_vals:
            out_f = fused.apply_static_fused(fa, h, gh)
            out_c = comb.apply_static(ca, table)
        else:
            dv = jnp.asarray(rng.normal(size=vp).astype(np.float32))
            out_f = fused.apply_dst_fused(fa, h, gh, dv)
            out_c = comb.apply_dst(ca, table, dv)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                                   rtol=1e-5, atol=1e-5)

        # Gradients: fused (dh, dghosts) must equal the combined dtable
        # split at vp — data-dependent cotangent (**2, CLAUDE.md).
        if static_vals:
            gf = jax.grad(lambda hh, gg: (
                fused.apply_static_fused(fa, hh, gg) ** 2).sum(),
                argnums=(0, 1))(h, gh)
            gc = jax.grad(lambda t: (
                comb.apply_static(ca, t) ** 2).sum())(table)
        else:
            gf = jax.grad(lambda hh, gg: (
                fused.apply_dst_fused(fa, hh, gg, dv) ** 2).sum(),
                argnums=(0, 1))(h, gh)
            gc = jax.grad(lambda t: (
                comb.apply_dst(ca, t, dv) ** 2).sum())(table)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gc[:vp]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gc[vp:]),
                                   rtol=1e-4, atol=1e-4)


def test_fused_dst_val_gradient(ops):
    sg, fused, comb, static_vals = ops
    if static_vals:
        pytest.skip("dst-val grad is the GAT flavor")
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(vp, 6)).astype(np.float32))
    gh = jnp.asarray(rng.normal(size=(n * mh, 6)).astype(np.float32))
    dv = jnp.asarray(rng.normal(size=vp).astype(np.float32))
    fa = _shard_view(fused.arrays, 0)
    ca = _shard_view(comb.arrays, 0)
    table = jnp.concatenate([h, gh], axis=0)
    gd_f = jax.grad(lambda d: (
        fused.apply_dst_fused(fa, h, gh, d) ** 2).sum())(dv)
    gd_c = jax.grad(lambda d: (
        comb.apply_dst(ca, table, d) ** 2).sum())(dv)
    np.testing.assert_allclose(np.asarray(gd_f), np.asarray(gd_c),
                               rtol=1e-4, atol=1e-4)


def test_fused_unit_and_bf16(ops):
    sg, fused, comb, static_vals = ops
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    rng = np.random.default_rng(9)
    h = jnp.asarray(rng.normal(size=(vp, 6)).astype(np.float32))
    gh = jnp.asarray(rng.normal(size=(n * mh, 6)).astype(np.float32))
    fa = _shard_view(fused.arrays, 1)
    ca = _shard_view(comb.arrays, 1)
    table = jnp.concatenate([h, gh], axis=0)
    u_f = fused.apply_unit_fused(fa, h, gh)
    if static_vals:
        # unit vs static only comparable through the unit entry on both.
        from dorylus_tpu.ops.hyb_spmm import _hyb_pass
        u_c = _hyb_pass(table, ca["fwd"], vp, "mask")
    else:
        u_c = comb.apply_dst(ca, table, jnp.ones(vp))
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_c),
                               rtol=1e-5, atol=1e-5)

    b16 = ShardedHybSpMM(sg, max_width=16, lam_slots=8,
                         static_vals=static_vals, edges="fused",
                         dynamic=False, gather_dtype=jnp.bfloat16)
    fa16 = _shard_view(b16.arrays, 1)
    if static_vals:
        o16 = b16.apply_static_fused(fa16, h, gh)
        o32 = fused.apply_static_fused(fa, h, gh)
    else:
        o16 = b16.apply_unit_fused(fa16, h, gh)
        o32 = u_f
    a32 = np.asarray(o32)
    assert np.abs(np.asarray(o16) - a32).max() <= 3e-2 * np.abs(a32).max()


def test_fused_engine_matches_single_device():
    """End-to-end: hyb overlap (auto -> fused) trains the same trajectory
    as single-device, both models."""
    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.engine import Engine
    from dorylus_tpu.parallel import ShardedEngine, make_mesh

    g = clustered_synthetic_graph(2048, 10, 24, 5, seed=11, window=256,
                                  cut=0.15)
    layers = LayerConfig([24, 12, 5])
    for model, lr in (("gcn", 0.01), ("gat", 0.005)):
        kw = dict(model=model, learning_rate=lr, epochs=5, eval_every=0,
                  kernel="hyb", reuse="off")
        r0 = Engine(g, layers, TrainConfig(**kw)).run()
        eng = ShardedEngine(g, layers, TrainConfig(**kw),  # overlap=auto
                            mesh=make_mesh(4))
        assert getattr(eng.model.spmm_split, "fused", False)
        rf = eng.run()
        np.testing.assert_allclose(
            [e.loss for e in rf.epochs], [e.loss for e in r0.epochs],
            rtol=2e-3, atol=2e-3)
