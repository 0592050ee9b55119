"""Bounded-staleness mode + per-stage profiling."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_staleness_zero_equals_sync():
    g = synthetic_graph(250, 6, 16, 4, seed=51)
    layers = LayerConfig([16, 8, 4])
    r0 = Engine(g, layers, TrainConfig(epochs=5, eval_every=0)).run()
    rs = Engine(g, layers, TrainConfig(epochs=5, eval_every=0, staleness=0)).run()
    for a, b in zip(r0.epochs, rs.epochs):
        np.testing.assert_allclose(a.loss, b.loss, rtol=1e-6)


def test_staleness_converges():
    """Gradients up to 3 epochs stale must still train (the reference's
    async mode claim, pipeline.cpp:95-102)."""
    g = synthetic_graph(400, 8, 24, 4, seed=53)
    layers = LayerConfig([24, 12, 4])
    r = Engine(g, layers, TrainConfig(epochs=40, eval_every=0, staleness=3)).run()
    assert r.epochs[-1].loss < r.epochs[0].loss * 0.6
    # And differs from sync training (it's actually doing something else).
    r0 = Engine(g, layers, TrainConfig(epochs=40, eval_every=0)).run()
    assert abs(r.epochs[-1].loss - r0.epochs[-1].loss) > 1e-9


def test_profile_stages():
    g = synthetic_graph(300, 6, 16, 4, seed=55)
    eng = Engine(g, LayerConfig([16, 8, 4]), TrainConfig(epochs=1, eval_every=0))
    eng.run()
    times = eng.profile(iters=2)
    assert "forward_ms" in times and "loss_and_grad_ms" in times
    assert all(v > 0 for v in times.values())
    assert "cost" in eng.report.notes
    assert eng.report.notes["cost"]["chip_seconds"] > 0


def test_profile_gat_growing_layer():
    """Round-5 regression: the dense bracket used w[:f] with f=fout,
    crashing on GAT layers that GROW the feature dim (and silently
    mis-shaping GCN shrinking layers); it must time the model's actual
    (V, fin) @ (fin, fout)."""
    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.engine.engine import Engine
    from dorylus_tpu.graph.graph import synthetic_graph

    g = synthetic_graph(500, 6, 4, 3, seed=1)
    eng = Engine(g, LayerConfig([4, 8, 3]),
                 TrainConfig(model="gat", learning_rate=0.005, epochs=1,
                             eval_every=0))
    times = eng.profile(iters=2)
    for l in (0, 1):
        assert times[f"dense_l{l}_ms"] > 0
        assert times[f"aggregate_l{l}_ms"] > 0
