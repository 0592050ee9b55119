"""GCN numerical parity vs the numpy oracle (the rebuild's version of
miscs/check-correctness/check-correctness.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorylus_tpu.common.config import LayerConfig, TRAIN_PORTION
from dorylus_tpu.engine.batch import build_batch
from dorylus_tpu.graph.graph import synthetic_graph
from dorylus_tpu.models.gcn import GCN

from oracle import gcn_forward, gcn_loss_and_grads


@pytest.fixture(scope="module")
def small():
    g = synthetic_graph(200, 6, 16, 5, seed=1)
    layers = LayerConfig([16, 8, 5])
    model = GCN(layers)
    params = model.init_params()
    batch = build_batch(g)
    return g, model, params, batch


def test_forward_matches_dense_oracle(small):
    g, model, params, batch = small
    S = g.dense_norm_adj()
    Ws = [np.asarray(params["w0"], np.float64), np.asarray(params["w1"], np.float64)]
    oracle = gcn_forward(S, np.asarray(g.features, np.float64), Ws)

    logits, inter = model.forward(params, batch, return_intermediates=True)
    for l in range(2):
        ah, z, h = inter[l]
        np.testing.assert_allclose(np.asarray(ah), oracle[l][0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z), oracle[l][1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), oracle[-1][2], rtol=1e-4, atol=1e-5)


def test_grads_match_handwritten_backward(small):
    """jax.grad must reproduce the reference's hand-derived backward chain
    (tanh' ⊙ S^T grad, dW = AH^T dZ — funcs/gcn/main.cpp:135-212)."""
    g, model, params, batch = small
    S = g.dense_norm_adj()
    Ws = [np.asarray(params["w0"], np.float64), np.asarray(params["w1"], np.float64)]
    onehot = np.asarray(batch.onehot, np.float64)
    train_mask = np.asarray(batch.train_mask, np.float64)
    denom = g.num_vertices * TRAIN_PORTION

    o_loss, o_dWs = gcn_loss_and_grads(S, np.asarray(g.features, np.float64),
                                       Ws, onehot, train_mask, denom)

    loss, grads = jax.value_and_grad(model.loss)(params, batch)
    np.testing.assert_allclose(float(loss), o_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["w0"]), o_dWs[0], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["w1"]), o_dWs[1], rtol=1e-3, atol=1e-6)


def test_training_decreases_loss(small):
    g, model, params, batch = small
    from dorylus_tpu.optim.adam import adam_init, adam_update

    opt = adam_init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(model.loss)(params, batch)
        params, opt = adam_update(params, grads, opt)
        return params, opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
