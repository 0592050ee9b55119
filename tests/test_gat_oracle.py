"""GAT forward parity vs the dense numpy oracle implementing Dorylus's
attention semantics (see models/gat.py docstring)."""

import jax
import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig
from dorylus_tpu.engine.batch import build_batch
from dorylus_tpu.graph.graph import synthetic_graph
from dorylus_tpu.models.gat import GAT

from oracle import gat_forward, np_softmax


@pytest.fixture(scope="module")
def small():
    g = synthetic_graph(150, 5, 12, 4, seed=3)
    layers = LayerConfig([12, 8, 4])
    model = GAT(layers)
    params = model.init_params()
    batch = build_batch(g, for_gat=True)
    return g, model, params, batch


def test_forward_matches_oracle(small):
    g, model, params, batch = small
    v = g.num_vertices
    A = np.zeros((v, v))
    A[g.dst, g.src] = 1.0  # possible multi-edges collapse; synthetic is deduped

    Ws = [np.asarray(params["w0"], np.float64), np.asarray(params["w1"], np.float64)]
    As = [np.asarray(params["a0"], np.float64), np.asarray(params["a1"], np.float64)]
    oracle = gat_forward(A, np.asarray(g.features, np.float64), Ws, As)

    logits, inter = model.forward(params, batch, return_intermediates=True)
    for l in range(2):
        z, az, att, h = inter[l]
        np.testing.assert_allclose(np.asarray(z), oracle[l][0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), oracle[l][2], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), oracle[-1][2], rtol=1e-3, atol=1e-4)


def test_gat_trains(small):
    g, model, params, batch = small
    from dorylus_tpu.optim.adam import adam_init, adam_update

    opt = adam_init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(model.loss)(params, batch)
        params, opt = adam_update(params, grads, opt, lr=0.01)
        return params, opt, loss

    losses = [float(step(params, opt)[2])]
    for _ in range(25):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
