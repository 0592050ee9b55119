"""Per-vertex output dumps + the compare_output differ + text export."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph import dataio
from dorylus_tpu.graph.graph import synthetic_graph

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from compare_output import compare  # noqa: E402
import pytest


@pytest.mark.slow
def test_dump_and_compare(tmp_path):
    g = synthetic_graph(150, 5, 8, 3, seed=71)
    layers = LayerConfig([8, 6, 3])
    a = Engine(g, layers, TrainConfig(epochs=3, eval_every=0))
    a.run()
    a.dump_predictions(tmp_path / "out_a.txt")
    # Same seed/run -> identical outputs.
    b = Engine(g, layers, TrainConfig(epochs=3, eval_every=0))
    b.run()
    b.dump_predictions(tmp_path / "out_b.txt")
    assert compare(str(tmp_path / "out_a.txt"), str(tmp_path / "out_b.txt")) == 0
    # Different training -> detected.
    c = Engine(g, layers, TrainConfig(epochs=8, eval_every=0))
    c.run()
    c.dump_predictions(tmp_path / "out_c.txt")
    assert compare(str(tmp_path / "out_a.txt"), str(tmp_path / "out_c.txt")) == 1


def test_features_to_text(tmp_path):
    g = synthetic_graph(40, 4, 6, 2, seed=73)
    dataio.write_features_bsnap(tmp_path / "f.bsnap", g.features)
    dataio.features_to_text(tmp_path / "f.bsnap", tmp_path / "f.txt")
    back = np.loadtxt(tmp_path / "f.txt")
    np.testing.assert_allclose(back, g.features, atol=1e-5)
