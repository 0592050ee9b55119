"""End-to-end golden accuracy test against an independently-trained oracle.

tests/data/golden/ holds a committed bsnap dataset and golden.json — the
loss/accuracy trajectory of a 2-layer GCN trained for 20 epochs by the
PURE-NUMPY oracle (tools/make_golden_fixture.py: oracle.gcn_loss_and_grads +
oracle.adam_step in float64, no jax anywhere in the training math). This is
the training-level role of the reference's external accuracy validation
(miscs/check-correctness/check-correctness.py:95-123 validates against
dumped weights; miscs/dgl-non-sampling provides independent baselines):
if the jax engines drift from the spec-level math, these assertions fail.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.graph.dataio import load_dataset

GOLDEN_DIR = Path(__file__).parent / "data" / "golden"


@pytest.fixture(scope="module")
def golden():
    spec = json.loads((GOLDEN_DIR / "golden.json").read_text())
    g = load_dataset(GOLDEN_DIR, feature_dim=spec["dims"][0])
    assert g.num_vertices == spec["num_vertices"]
    assert g.num_edges == spec["num_edges"]
    return g, spec


def _check_trajectory(report, spec):
    losses = [e.loss for e in report.epochs]
    accs = [e.accuracy for e in report.epochs]
    np.testing.assert_allclose(losses, spec["train_loss"], rtol=0, atol=0.02)
    # Validation accuracy is quantized at 1/|val| = 1/40: allow the f32-vs-
    # f64 drift to flip at most two vertices per epoch.
    assert np.max(np.abs(np.array(accs) - np.array(spec["val_acc"]))) <= 0.055
    assert abs(report.test_accuracy - spec["test_acc"]) <= 0.055


def test_engine_hits_golden_trajectory(golden):
    from dorylus_tpu.engine.engine import Engine

    g, spec = golden
    cfg = TrainConfig(epochs=spec["epochs"], learning_rate=spec["lr"],
                      eval_every=1)
    eng = Engine(g, LayerConfig(spec["dims"]), cfg)
    report = eng.run()
    _check_trajectory(report, spec)


def test_sharded_engine_hits_golden_trajectory(golden):
    from dorylus_tpu.parallel.mesh import make_mesh
    from dorylus_tpu.parallel.train_step import ShardedEngine

    g, spec = golden
    cfg = TrainConfig(epochs=spec["epochs"], learning_rate=spec["lr"],
                      eval_every=1, num_shards=4)
    eng = ShardedEngine(g, LayerConfig(spec["dims"]), cfg, mesh=make_mesh(4))
    report = eng.run()
    _check_trajectory(report, spec)
