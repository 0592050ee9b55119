"""Build the vendored real-data graph: tests/data/digits/.

The reference's correctness story runs on real graphs (Reddit/Amazon,
miscs/dgl-non-sampling/README:1-12); this environment has no network, so
the smallest REAL dataset available offline is scikit-learn's bundled
UCI handwritten digits (1797 samples x 64 grayscale features, 10
classes — actual sensor data, not a planted synthetic). The graph is an
8-nearest-neighbor similarity graph over the raw features, symmetrized,
written in the reference's own bsnap byte formats
(inputs/graphToBinary.cpp / featuresToBinary.cpp / labelsToBinary.cpp)
so the loader path being tested is the same one Reddit would use.

Deterministic: sklearn's exact kNN on fixed data. Run once; the ~630 KB
output is committed so tests don't depend on sklearn.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def build():
    from sklearn.datasets import load_digits
    from sklearn.neighbors import NearestNeighbors

    from dorylus_tpu.graph.graph import Graph

    dig = load_digits()
    x = (dig.data.astype(np.float32) / 16.0)  # 4-bit pixel counts -> [0,1]
    y = dig.target.astype(np.int32)
    nn = NearestNeighbors(n_neighbors=9).fit(x)
    _, idx = nn.kneighbors(x)
    src = idx[:, 1:].ravel().astype(np.int32)  # drop the self column
    dst = np.repeat(np.arange(len(x), dtype=np.int32), 8)
    s, d = Graph.make_undirected(src, dst)
    return s, d, x, y


def main():
    from dorylus_tpu.graph import dataio

    out = Path(__file__).resolve().parent.parent / "tests" / "data" / "digits"
    out.mkdir(parents=True, exist_ok=True)
    s, d, x, y = build()
    dataio.write_graph_bsnap(out / "graph.bsnap", s, d, len(x))
    dataio.write_features_bsnap(out / "features.bsnap", x)
    dataio.write_labels_bsnap(out / "labels.bsnap", y, 10)
    print(f"wrote {out}: V={len(x)} E={len(s)} F={x.shape[1]} C=10")


if __name__ == "__main__":
    main()
