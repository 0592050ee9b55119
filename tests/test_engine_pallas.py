"""Engine with kernel='pallas' must train identically to the XLA path."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_pallas_engine_matches_xla():
    g = synthetic_graph(300, 6, 16, 4, seed=41)
    layers = LayerConfig([16, 8, 4])
    r_x = Engine(g, layers, TrainConfig(epochs=4, eval_every=0)).run()
    r_p = Engine(g, layers, TrainConfig(epochs=4, eval_every=0,
                                        kernel="pallas")).run()
    for ex, ep in zip(r_x.epochs, r_p.epochs):
        np.testing.assert_allclose(ex.loss, ep.loss, rtol=5e-4, atol=1e-6)


def test_pallas_engine_gat():
    g = synthetic_graph(200, 5, 12, 3, seed=43)
    layers = LayerConfig([12, 6, 3])
    cfg = dict(model="gat", epochs=3, eval_every=0, learning_rate=0.005)
    r_x = Engine(g, layers, TrainConfig(**cfg)).run()
    r_p = Engine(g, layers, TrainConfig(**cfg, kernel="pallas")).run()
    for ex, ep in zip(r_x.epochs, r_p.epochs):
        np.testing.assert_allclose(ex.loss, ep.loss, rtol=1e-3, atol=1e-6)
