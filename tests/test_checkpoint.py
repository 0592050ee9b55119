"""Checkpoint/resume: training continues bit-exact after reload."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_resume_continues_exactly(tmp_path):
    g = synthetic_graph(200, 6, 16, 4, seed=31)
    layers = LayerConfig([16, 8, 4])

    # Run 10 epochs straight through.
    cfg_a = TrainConfig(epochs=10, eval_every=0)
    a = Engine(g, layers, cfg_a)
    ra = a.run()

    # Run 5 epochs + checkpoint, then resume for 5 more.
    ckdir = str(tmp_path / "ck")
    cfg_b = TrainConfig(epochs=5, eval_every=0, checkpoint_dir=ckdir,
                        checkpoint_every=5)
    b = Engine(g, layers, cfg_b)
    b.run()
    cfg_c = TrainConfig(epochs=5, eval_every=0, checkpoint_dir=ckdir,
                        resume=True)
    c = Engine(g, layers, cfg_c)
    assert c.start_epoch == 5
    rc = c.run()

    np.testing.assert_allclose(ra.epochs[-1].loss, rc.epochs[-1].loss,
                               rtol=1e-6, atol=1e-8)
