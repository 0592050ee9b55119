"""Pure-numpy oracles for GCN/GAT with Dorylus-exact semantics.

Ports the semantics of miscs/check-correctness/check-correctness.py and
miscs/numpy-gnn (dense S = D~^-1/2 (A+I) D~^-1/2, tanh, row softmax) plus
the final-layer gradient of funcs/gcn/main.cpp:96-101 (maskout +
(preds-labels)/trainset_size). Used as the executable spec in tests.
"""

from __future__ import annotations

import numpy as np


def np_softmax(z):
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def gcn_forward(S, X, Ws):
    """Returns list of (ah, z, h) per layer; h of last layer = logits."""
    h = X
    inter = []
    for l, W in enumerate(Ws):
        ah = S @ h
        z = ah @ W
        h = np.tanh(z) if l < len(Ws) - 1 else z
        inter.append((ah, z, h))
    return inter


def gcn_loss_and_grads(S, X, Ws, onehot, train_mask, denom):
    """Masked CE loss and weight gradients via the reference's hand-derived
    backward chain (funcs/gcn/main.cpp backwardLayer/finalLayer)."""
    inter = gcn_forward(S, X, Ws)
    logits = inter[-1][2]
    preds = np_softmax(logits)
    m = train_mask.astype(np.float64)[:, None]
    loss = -(m * onehot * np.log(np.maximum(preds, 1e-30))).sum() / denom

    L = len(Ws)
    dWs = [None] * L
    # Final layer: d_out = mask*(preds - onehot)/denom
    d_out = m * (preds - onehot) / denom
    ah_last = inter[-1][0]
    dWs[-1] = ah_last.T @ d_out
    grad = d_out @ Ws[-1].T  # interGrad pushed down
    for l in range(L - 2, -1, -1):
        # Backward aggregate: aTg = S^T grad (gcn_ops backward dir)
        aTg = S.T @ grad
        z = inter[l][1]
        dz = aTg * (1.0 - np.tanh(z) ** 2)
        ah = inter[l][0]
        dWs[l] = ah.T @ dz
        grad = dz @ Ws[l].T
    return loss, dWs


def gat_forward(A_dense, X, Ws, As, slope=0.01):
    """Dorylus GAT oracle. A_dense is the {0,1} adjacency (dst, src).
    Returns list of (z, az_edge_dense, h) per layer."""
    h = X
    inter = []
    for W, a in zip(Ws, As):
        z = h @ W
        za = (z @ a)[:, 0]  # (V,) attention logit per *destination*
        att = np.where(za > 0, za, slope * za)  # LeakyReLU
        # ah_v = z_v + sum_u A[v,u] * att_v * z_u
        agg = (A_dense * att[:, None]) @ z
        h = z + agg
        inter.append((z, za, h))
    return inter


def adam_step(w, g, m, v, t, lr=0.01, b1=0.9, b2=0.999, eps=1e-7):
    """Reference AdamOptimizer::update + nextIteration (AdamOptimizer.cpp)."""
    lr_t = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    w = w - lr_t * m / (np.sqrt(v) + eps)
    return w, m, v
