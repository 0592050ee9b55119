"""Multi-device sharded training on the virtual 8-CPU mesh: the sharded
engine (halo exchange + psum) must reproduce single-device results."""

import jax
import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph
from dorylus_tpu.graph.partition import partition_graph
from dorylus_tpu.parallel.mesh import make_mesh
from dorylus_tpu.parallel.train_step import ShardedEngine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (virtual CPU mesh)")


def test_partition_roundtrip():
    """Every real edge appears exactly once across shards; ghost indexing
    reconstructs the right source features."""
    g = synthetic_graph(300, 6, 8, 4, seed=5)
    sg = partition_graph(g, 4, method="range")
    total_edges = sum(s.num_edges for s in sg.shards)
    assert total_edges == g.num_edges
    # Reconstruct aggregation through the halo plan in numpy and compare
    # against the dense oracle.
    h = g.features.astype(np.float64)
    S = g.dense_norm_adj()
    want = S @ h
    got = np.zeros_like(want)
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    # Build each shard's feature table the way halo_exchange would.
    tables = []
    for s in sg.shards:
        table = np.zeros((vp + n * mh, h.shape[1]))
        table[:vp] = np.where(s.global_ids[:, None] >= 0, h[np.maximum(s.global_ids, 0)], 0)
        for p_id, p in enumerate(sg.shards):
            rows = p.send_idx[s.shard_id]
            table[vp + p_id * mh: vp + (p_id + 1) * mh] = np.where(
                p.global_ids[rows][:, None] >= 0, h[np.maximum(p.global_ids[rows], 0)], 0)
        tables.append(table)
    for s, table in zip(sg.shards, tables):
        agg = np.zeros((vp, h.shape[1]))
        np.add.at(agg, s.dst, s.edge_val[:, None] * table[s.src])
        agg += s.self_val[:, None] * table[:vp]
        real = s.global_ids >= 0
        got[s.global_ids[real]] = agg[real]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("method", ["range", "hash", "ldg"])
def test_sharded_matches_single_device(method):
    g = synthetic_graph(400, 6, 16, 5, seed=13)
    layers = LayerConfig([16, 8, 5])
    cfg = TrainConfig(epochs=5, eval_every=5)

    single = Engine(g, layers, cfg)
    r1 = single.run()

    mesh = make_mesh(8)
    sharded = ShardedEngine(g, layers, cfg, mesh=mesh, partition_method=method)
    r2 = sharded.run()

    # Loss trajectories must agree to float tolerance.
    for e1, e2 in zip(r1.epochs, r2.epochs):
        np.testing.assert_allclose(e1.loss, e2.loss, rtol=2e-4, atol=1e-6)
    assert abs(r1.final_accuracy - r2.final_accuracy) < 0.03


def test_sharded_gat_matches_single_device():
    g = synthetic_graph(240, 5, 12, 4, seed=17)
    layers = LayerConfig([12, 8, 4])
    cfg = TrainConfig(model="gat", epochs=4, eval_every=4, learning_rate=0.005)

    r1 = Engine(g, layers, cfg).run()
    r2 = ShardedEngine(g, layers, cfg, mesh=make_mesh(4)).run()
    for e1, e2 in zip(r1.epochs, r2.epochs):
        np.testing.assert_allclose(e1.loss, e2.loss, rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("kernel,model", [("xla", "gcn"), ("degree", "gcn"),
                                          ("degree", "gat")])
@pytest.mark.slow
def test_overlap_equals_combined_path(kernel, model):
    """Interior/boundary-split aggregation (overlap=True) must match the
    combined-table path — for the XLA edgewise kernel AND the degree
    kernel (round 2 disabled overlap exactly where auto selects degree)."""
    g = synthetic_graph(300, 6, 16, 4, seed=19)
    layers = LayerConfig([16, 8, 4])
    kw = dict(epochs=4, eval_every=0, kernel=kernel, model=model)
    if model == "gat":
        kw["learning_rate"] = 0.003
    r_ov = ShardedEngine(g, layers, TrainConfig(overlap=True, **kw),
                         mesh=make_mesh(4)).run()
    r_cm = ShardedEngine(g, layers, TrainConfig(overlap=False, **kw),
                         mesh=make_mesh(4)).run()
    for a, b in zip(r_ov.epochs, r_cm.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=1e-5)


def test_halo_planned_backward_matches_autodiff():
    """The planned halo backward (sorted segment_sum, halo.build_recv_plan)
    must equal the autodiff gather-VJP (scatter-add) it replaces."""
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from dorylus_tpu.parallel.halo import build_recv_plan, halo_recv
    from dorylus_tpu.parallel.mesh import GRAPH_AXIS

    n, vp, mh, f = 4, 32, 8, 5
    rng = np.random.default_rng(0)
    send = rng.integers(0, vp, size=(n, n, mh)).astype(np.int32)
    h = rng.normal(size=(n, vp, f)).astype(np.float32)
    plans = [build_recv_plan(send[s]) for s in range(n)]
    order = np.stack([p[0] for p in plans])
    rows = np.stack([p[1] for p in plans])
    mesh = make_mesh(n)

    def make(planned):
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                           P(GRAPH_AXIS)),
                 out_specs=P(GRAPH_AXIS), check_vma=False)
        def loss(h, s, o, r):
            h, s, o, r = h[0], s[0], o[0], r[0]
            plan = (o, r) if planned else None
            out = halo_recv(h, s, plan=plan)
            return jax.lax.psum((out * out).sum(), GRAPH_AXIS)[None]

        def scalar(h):
            return loss(h, jnp.asarray(send), jnp.asarray(order),
                        jnp.asarray(rows))[0]

        return jax.jit(jax.grad(scalar))

    g_auto = np.asarray(make(False)(jnp.asarray(h)))
    g_plan = np.asarray(make(True)(jnp.asarray(h)))
    np.testing.assert_allclose(g_plan, g_auto, rtol=1e-5, atol=1e-6)


def test_hyb_top_pad_hub_count_mismatch():
    import jax.numpy as jnp
    """Regression (round-5 review): when the shard holding the cross-shard
    MAX top chunk-row count has FEWER hubs than the cross-shard max hub
    count, _uniform_plans must not corrupt inv[vp-1]. Pre-fix, _pad_rows
    returned the source dict un-copied at pad==0, the padded hub list
    aliased back into the plan, and the inv rebuild wrote a dead hub row
    over vertex vp-1 — silently zeroing its aggregated output.

    Shard 0: one hub of in-degree 24 (6 chunk rows at width 4).
    Shard 1: three hubs of in-degree 8 (2 rows each, also 6 rows).
    Vertex 7 (= shard 0 local vp-1) has real in-edges — the canary."""
    from dorylus_tpu.graph.graph import Graph
    from dorylus_tpu.ops.hyb_sharded import ShardedHybSpMM

    src, dst = [], []
    for k in range(24):  # hub 0 on shard 0
        src.append(1 + k % 7)
        dst.append(0)
    for s in (5, 6):  # the canary: vertex vp-1 of shard 0
        src.append(s)
        dst.append(7)
    src.append(2)  # low-degree filler so shard 0 has plain buckets
    dst.append(1)
    for hub in (8, 9, 10):  # three smaller hubs on shard 1
        for k in range(8):
            src.append(11 + k % 5)
            dst.append(hub)
    src.append(13)
    dst.append(12)
    g = Graph(16, np.asarray(src, np.int32), np.asarray(dst, np.int32),
              features=np.random.default_rng(0).normal(
                  size=(16, 3)).astype(np.float32),
              labels=np.zeros(16, np.int32), num_classes=2).finalize()
    sg = partition_graph(g, 2, method="range")
    op = ShardedHybSpMM(sg, max_width=4, lam_slots=8, static_vals=True,
                        dynamic=False)
    assert op.arrays["fwd"]["top"] is not None, "want hub coverage"
    n, vp, mh = sg.n_shards, sg.vp, sg.max_h
    rng = np.random.default_rng(1)
    for s_i, s in enumerate(sg.shards):
        h = rng.normal(size=(vp, 3)).astype(np.float32)
        ghosts = rng.normal(size=(n * mh, 3)).astype(np.float32)
        table = np.concatenate([h, ghosts], axis=0)
        arrays = jax.tree.map(lambda v: v[s_i], op.arrays)
        got = np.asarray(op.apply_static(arrays, jnp.asarray(table)))
        want = np.zeros((vp, 3))
        np.add.at(want, s.dst, s.edge_val[:, None] * table[s.src])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"shard {s_i}")
