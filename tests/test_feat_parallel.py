"""Feature/tensor parallelism (mesh 'feat' axis, models/gcn.py
_forward_tp): slicing the aggregation into F/m column blocks and
psum-assembling the layer matmuls must reproduce the single-device
trajectory exactly — a TPU-native extension with no reference analog
(the reference has only graph parallelism)."""

import jax
import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph
from dorylus_tpu.parallel.mesh import make_mesh
from dorylus_tpu.parallel.train_step import ShardedEngine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (virtual CPU mesh)")


@pytest.mark.parametrize("n,m,kernel", [(2, 2, "xla"), (1, 4, "xla"),
                                        (2, 2, "hyb"), (2, 4, "hyb")])
def test_tp_matches_single_device(n, m, kernel):
    g = synthetic_graph(400, 6, 16, 5, seed=13)
    layers = LayerConfig([16, 8, 5])
    cfg = TrainConfig(epochs=5, eval_every=5, kernel=kernel, reuse="off")
    r1 = Engine(g, layers, cfg).run()
    import dataclasses
    cfg2 = dataclasses.replace(cfg, feat_shards=m, num_shards=n)
    r2 = ShardedEngine(g, layers, cfg2,
                       mesh=make_mesh(n, feat_shards=m)).run()
    for e1, e2 in zip(r1.epochs, r2.epochs):
        np.testing.assert_allclose(e1.loss, e2.loss, rtol=5e-4, atol=1e-6)
    assert abs(r1.final_accuracy - r2.final_accuracy) < 0.03


def test_tp_rejects_indivisible_width():
    g = synthetic_graph(200, 5, 10, 4, seed=3)
    with pytest.raises(AssertionError, match="divisible"):
        ShardedEngine(g, LayerConfig([10, 8, 4]),
                      TrainConfig(epochs=1, feat_shards=4, reuse="off"),
                      mesh=make_mesh(2, feat_shards=4))
