"""Depth generality: the reference is hard-wired to 2 layers in places
(check-correctness.py); our models must handle arbitrary LayerConfig depth."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_three_layer_gcn_trains():
    g = synthetic_graph(400, 7, 24, 5, seed=81)
    layers = LayerConfig([24, 16, 8, 5])
    r = Engine(g, layers, TrainConfig(epochs=30, eval_every=10)).run()
    assert r.epochs[-1].loss < r.epochs[0].loss * 0.7
    assert r.final_accuracy > 0.3


def test_three_layer_gat_trains():
    g = synthetic_graph(250, 5, 12, 3, seed=83)
    layers = LayerConfig([12, 8, 6, 3])
    cfg = TrainConfig(model="gat", epochs=12, eval_every=0, learning_rate=0.003)
    r = Engine(g, layers, cfg).run()
    assert r.epochs[-1].loss < r.epochs[0].loss


def test_one_layer_gcn():
    """Degenerate single-layer model (logistic regression over S·X)."""
    g = synthetic_graph(200, 5, 10, 4, seed=85)
    r = Engine(g, LayerConfig([10, 4]), TrainConfig(epochs=20, eval_every=0)).run()
    assert r.epochs[-1].loss < r.epochs[0].loss
