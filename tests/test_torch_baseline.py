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
