"""Activations + loss with Dorylus-exact semantics.

- tanh hidden activation (CPUComm::activate, CPU_comm.cpp:265-274)
- row softmax with max-subtraction and 1e-20 denom guard
  (CPU_comm.cpp:276-297; funcs/gcn softmax)
- leaky ReLU slope 0.01 (funcs/gat/ops/forward_ops.cpp:39;
  derivative backward_ops.cpp:16-24)
- masked cross-entropy whose gradient reproduces the reference's
  maskout + (preds - labels) / trainset_size final-layer gradient
  (funcs/gcn/main.cpp:96-101, CPU_comm.cpp:464-471).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_softmax(z: jnp.ndarray) -> jnp.ndarray:
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    e = jnp.exp(z)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-20)


def leaky_relu(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x > 0, x, slope * x)


def masked_softmax_xent(
    logits: jnp.ndarray,  # (V, C)
    onehot: jnp.ndarray,  # (V, C) float one-hot labels
    mask: jnp.ndarray,  # (V,) float {0,1} — which rows contribute
    denom: float | jnp.ndarray,  # global trainset size (|V_global| * 0.66)
) -> jnp.ndarray:
    """Sum over masked rows of CE(softmax(logits), onehot) / denom.

    d(loss)/d(logits) = mask * (softmax(logits) - onehot) / denom, identical
    to the reference's d_out after maskout (funcs/gcn/main.cpp:96-101: maskout
    copies labels into non-train prediction rows so their gradient vanishes,
    then d_out = (preds - labels)/trainset_size).
    """
    logz = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(onehot.astype(logz.dtype) * logz, axis=-1)
    return jnp.sum(per_row * mask.astype(per_row.dtype)) / denom


def accuracy_and_loss(
    probs: jnp.ndarray,  # (V, C) softmax predictions
    onehot: jnp.ndarray,
    mask: jnp.ndarray,  # rows to evaluate (e.g. validation slice)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluation identical to sendAccLoss (funcs/gcn/ops/network_ops.cpp:142-156):
    acc counts label[argmax(pred)]; loss = -log pred[argmax(label)]. Returns
    (correct_count, loss_sum, row_count) so callers can psum across shards."""
    m = mask.astype(jnp.float32)
    pred_cls = jnp.argmax(probs, axis=-1)
    correct = jnp.sum(jnp.take_along_axis(onehot, pred_cls[:, None],
                                          axis=1)[:, 0].astype(jnp.float32)
                      * m)
    true_cls = jnp.argmax(onehot, axis=-1)
    p_true = jnp.take_along_axis(probs, true_cls[:, None], axis=1)[:, 0]
    loss = -jnp.sum(jnp.log(jnp.maximum(p_true, 1e-30)) * m)
    return correct, loss, jnp.sum(m)
