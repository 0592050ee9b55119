"""Independent-framework accuracy baseline (the miscs/dgl-non-sampling
role): the same real dataset, model math, and training recipe in pure
torch (CPU) must reach the same accuracy band as the jax engine.

The reference validates its training by running the same datasets
through DGL (/root/reference/miscs/dgl-non-sampling/README:1-12); no
network access means no DGL here, but torch's autograd and kernels are
fully independent of jax, so agreement pins the whole numeric recipe
(S = D^-1/2 (A) D^-1/2 aggregation with the reference's self-loop
handling, tanh, maskout'd mean loss, Adam eps 1e-7) rather than just the
kernels (which tests/oracle.py already covers vs numpy).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # keeps the suite hermetic without it

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.dataio import load_dataset
from pathlib import Path

DATA = Path(__file__).parent / "data" / "digits"


def torch_gcn_train(g, hidden=16, epochs=100, lr=0.01):
    torch.manual_seed(0)
    v = g.num_vertices
    # Reference normalization (dataloader.cpp:153-185): edge values
    # (deg_src+1)^-1/2 (deg_dst+1)^-1/2, self loop (deg+1)^-1 — both are
    # precomputed on the Graph, so consume them as data.
    idx = torch.tensor(np.stack([g.dst, g.src]).astype(np.int64))
    a = torch.sparse_coo_tensor(
        idx, torch.tensor(g.edge_norm), (v, v)).coalesce()
    self_val = torch.tensor(g.self_norm)[:, None]

    def agg(h):
        return torch.sparse.mm(a, h) + self_val * h

    x = torch.tensor(g.features)
    labels = torch.tensor(g.labels.astype(np.int64))
    tr, va, _ = (torch.tensor(m.astype(bool)) for m in g.masks())
    f_in, classes = g.features.shape[1], g.num_classes
    gen = torch.Generator().manual_seed(8888)
    w1 = torch.nn.Parameter(
        (torch.rand(f_in, hidden, generator=gen) * 2 - 1)
        * float(np.sqrt(6.0 / (f_in + hidden))))
    w2 = torch.nn.Parameter(
        (torch.rand(hidden, classes, generator=gen) * 2 - 1)
        * float(np.sqrt(6.0 / (hidden + classes))))
    opt = torch.optim.Adam([w1, w2], lr=lr, betas=(0.9, 0.999), eps=1e-7)
    n_train = int(tr.sum())
    for _ in range(epochs):
        opt.zero_grad()
        h = torch.tanh(agg(x @ w1))
        out = agg(h @ w2)
        # maskout + /(train count) loss scale (funcs/gcn/main.cpp:100-101)
        loss = torch.nn.functional.cross_entropy(
            out[tr], labels[tr], reduction="sum") / n_train
        loss.backward()
        opt.step()
    with torch.no_grad():
        out = agg(torch.tanh(agg(x @ w1)) @ w2)
        val_acc = float((out[va].argmax(1) == labels[va]).float().mean())
    return val_acc


@pytest.fixture(scope="module")
def digits_graph():
    return load_dataset(DATA, undirected=True)


@pytest.mark.slow
def test_torch_gcn_same_accuracy_band(digits_graph):
    g = digits_graph
    torch_acc = torch_gcn_train(g)
    rep = Engine(g, LayerConfig([64, 16, 10]),
                 TrainConfig(epochs=100, eval_every=0)).run()
    # Both frameworks train the same recipe on the same real data: each
    # must clear the band and land near each other.
    assert torch_acc >= 0.95, torch_acc
    assert rep.final_accuracy >= 0.95, rep.final_accuracy
    assert abs(torch_acc - rep.final_accuracy) < 0.04, (
        torch_acc, rep.final_accuracy)


def torch_gat_train(g, hidden=16, epochs=100, lr=0.01):
    """Dorylus GAT semantics in pure torch (models/gat.py docstring):
    z = h W; att_e = LeakyReLU(<z_dst, a>, .01) — destination only, NO
    softmax (forward_ops.cpp:109-141); h' = z + sum_u att_e z_u; no
    hidden activation anywhere (gat_ops.cpp:173-243)."""
    torch.manual_seed(0)
    x = torch.tensor(g.features)
    labels = torch.tensor(g.labels.astype(np.int64))
    tr, va, _ = (torch.tensor(m.astype(bool)) for m in g.masks())
    src = torch.tensor(g.src.astype(np.int64))
    dst = torch.tensor(g.dst.astype(np.int64))
    f_in, classes = g.features.shape[1], g.num_classes
    gen = torch.Generator().manual_seed(8888)

    def xav(a, b):
        return torch.nn.Parameter(
            (torch.rand(a, b, generator=gen) * 2 - 1)
            * float(np.sqrt(6.0 / (a + b))))

    def kai(a):
        return torch.nn.Parameter(
            torch.randn(a, 1, generator=gen) * float(np.sqrt(2.0 / a)))

    ws = [xav(f_in, hidden), xav(hidden, classes)]
    avs = [kai(hidden), kai(classes)]
    opt = torch.optim.Adam(ws + avs, lr=lr, betas=(0.9, 0.999), eps=1e-7)

    def fwd(h):
        for w, a in zip(ws, avs):
            z = h @ w
            att = torch.nn.functional.leaky_relu((z @ a)[dst, 0], 0.01)
            agg = torch.zeros_like(z).index_add_(
                0, dst, att[:, None] * z[src])
            h = z + agg
        return h

    n_train = int(tr.sum())
    for _ in range(epochs):
        opt.zero_grad()
        out = fwd(x)
        loss = torch.nn.functional.cross_entropy(
            out[tr], labels[tr], reduction="sum") / n_train
        loss.backward()
        opt.step()
    with torch.no_grad():
        out = fwd(x)
        return float((out[va].argmax(1) == labels[va]).float().mean())


@pytest.mark.slow
def test_torch_gat_same_accuracy_band(digits_graph):
    """The GAT twin (round-3 verdict #6): the non-textbook attention
    semantics pinned on real data against an independent framework.
    Features scaled to [0,1] — see test_real_dataset.py
    test_gat_real_data_accuracy."""
    import dataclasses

    g = dataclasses.replace(
        digits_graph, features=(digits_graph.features / 16.0).astype(
            np.float32))
    torch_acc = torch_gat_train(g)
    rep = Engine(g, LayerConfig([64, 16, 10]),
                 TrainConfig(model="gat", learning_rate=0.01,
                             epochs=100, eval_every=0)).run()
    assert torch_acc >= 0.93, torch_acc
    assert rep.final_accuracy >= 0.95, rep.final_accuracy
    assert abs(torch_acc - rep.final_accuracy) < 0.05, (
        torch_acc, rep.final_accuracy)
