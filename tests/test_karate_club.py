"""Second real-data anchor: Zachary's karate club (1977), via networkx.

The digits anchor (tests/test_real_dataset.py) pins accuracy on a real
feature graph; this one pins the *structure-only* regime — 34 vertices,
78 undirected edges, identity features, labels = the club each member
actually joined after the documented fission. A GCN can only solve it
through aggregation (the features carry no information), so it anchors
the propagation math on a real published graph with real published
ground truth, complementing the reference's external-baseline
methodology (miscs/dgl-non-sampling/README:1-12) offline.

Split: the dorylus recipe (0.66/0.10/0.24 by file order,
src/common/utils.hpp:60-62) over a FIXED shuffled vertex order via
Graph.split_ids — networkx's node order lists all nine test vertices
from one faction, which a constant predictor solves; shuffling the
"file order" (what split_ids models) makes the split class-mixed while
keeping the exact reference split semantics.

Measured bands (fixed seed-8888 init, deterministic data => the run is
deterministic per platform; asserted with slack): 7/9 held-out members
recovered — the two misses are vertices 2 and 8, the two canonical
boundary members (vertex 8 is the one Zachary's own min-cut model
misassigns; vertex 2 has strong ties to both leaders) — while a
graph-blind logistic readout on the same identity features is at chance
(measured 5/9): the margin is pure aggregation.
"""

import networkx as nx
import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import Graph
import pytest


def _karate_graph() -> Graph:
    kg = nx.karate_club_graph()
    v = kg.number_of_nodes()
    e = np.asarray(kg.edges(), dtype=np.int32)
    src, dst = Graph.make_undirected(e[:, 0], e[:, 1])
    labels = np.asarray(
        [0 if kg.nodes[n]["club"] == "Mr. Hi" else 1 for n in range(v)],
        dtype=np.int32)
    g = Graph(
        num_vertices=v, src=src, dst=dst,
        features=np.eye(v, dtype=np.float32),
        labels=labels, num_classes=2,
        split_ids=np.random.default_rng(0).permutation(v).astype(np.int32),
    )
    return g.finalize()


@pytest.mark.slow
def test_gcn_karate_faction_recovery():
    g = _karate_graph()
    eng = Engine(g, LayerConfig([34, 8, 2]), TrainConfig(
        epochs=120, eval_every=0))
    rep = eng.run()
    preds = eng.predict(softmax=True).argmax(axis=1)
    _, _, test_mask = g.masks()
    test_acc = float((preds[test_mask] == g.labels[test_mask]).mean())
    assert test_mask.sum() == 9
    # Measured: 7/9 — the misses are exactly the two canonical boundary
    # members (see module docstring); everything else must be recovered.
    assert test_acc >= 7 / 9, (test_acc, rep.summary())
    wrong = np.where(test_mask)[0][preds[test_mask] != g.labels[test_mask]]
    assert set(wrong).issubset({2, 8}), wrong


def test_karate_features_alone_are_chance():
    """Identity features carry no label signal: a graph-blind multinomial
    logistic fit on the train rows predicts held-out members at chance.
    This is the anchor's control — it proves the GCN's recovery above
    comes from propagation over the real edge structure."""
    from sklearn.linear_model import LogisticRegression

    g = _karate_graph()
    train_mask, _, test_mask = g.masks()
    x = g.features
    clf = LogisticRegression(max_iter=1000).fit(
        x[train_mask], g.labels[train_mask])
    acc = clf.score(x[test_mask], g.labels[test_mask])
    assert acc <= 6 / 9, acc  # measured 5/9
