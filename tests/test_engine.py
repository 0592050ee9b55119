"""End-to-end single-device engine runs (Cora-shaped synthetic)."""

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_gcn_end_to_end_learns():
    g = synthetic_graph(600, 8, 32, 6, seed=7)
    eng = Engine(g, LayerConfig([32, 16, 6]), TrainConfig(epochs=40, eval_every=10))
    report = eng.run()
    assert report.final_accuracy is not None
    # Planted-structure graph: must beat random guessing (1/6) solidly.
    assert report.final_accuracy > 0.35, report.summary()
    assert len(report.epochs) == 40


def test_early_stop():
    g = synthetic_graph(400, 8, 32, 4, seed=9)
    cfg = TrainConfig(epochs=200, eval_every=1, target_accuracy=0.5)
    eng = Engine(g, LayerConfig([32, 16, 4]), cfg)
    report = eng.run()
    assert len(report.epochs) < 200


def test_gat_end_to_end():
    g = synthetic_graph(300, 6, 16, 4, seed=11)
    cfg = TrainConfig(model="gat", epochs=15, eval_every=5, learning_rate=0.005)
    eng = Engine(g, LayerConfig([16, 8, 4]), cfg)
    report = eng.run()
    assert report.final_accuracy is not None
