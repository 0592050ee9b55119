"""Round-trip tests for the reference binary dataset formats."""

import numpy as np

from dorylus_tpu.graph import dataio
from dorylus_tpu.graph.graph import synthetic_graph


def test_bsnap_roundtrip(tmp_path):
    g = synthetic_graph(120, 5, 8, 3, seed=21)
    dataio.save_dataset(tmp_path, g)

    src, dst, num_v = dataio.read_graph_bsnap(tmp_path / "graph.bsnap")
    assert num_v == g.num_vertices
    assert len(src) == g.num_edges
    feats = dataio.read_features_bsnap(tmp_path / "features.bsnap")
    np.testing.assert_array_equal(feats, g.features)
    labels, kinds = dataio.read_labels_bsnap(tmp_path / "labels.bsnap")
    assert kinds == g.num_classes
    np.testing.assert_array_equal(labels, g.labels)

    g2 = dataio.load_dataset(tmp_path)
    assert g2.num_vertices == g.num_vertices
    # make_undirected may reorder but edge set must match
    e1 = set(zip(g.src.tolist(), g.dst.tolist()))
    e2 = set(zip(g2.src.tolist(), g2.dst.tolist()))
    assert e1 == e2


def test_header_layout_matches_cxx_struct(tmp_path):
    """The graph.bsnap header must be the 16-byte padded C struct
    {int32, uint32, pad4, uint64} (graphToBinary.cpp:15-19)."""
    g = synthetic_graph(50, 3, 4, 2, seed=1)
    dataio.write_graph_bsnap(tmp_path / "g.bsnap", g.src, g.dst, g.num_vertices)
    raw = (tmp_path / "g.bsnap").read_bytes()
    import struct
    size_of_vtx, num_v = struct.unpack_from("<iI", raw, 0)
    (num_e,) = struct.unpack_from("<Q", raw, 8)
    assert size_of_vtx == 4 and num_v == 50 and num_e == g.num_edges
    assert len(raw) == 16 + 8 * g.num_edges


def test_parts_file_roundtrip(tmp_path):
    parts = np.array([0, 1, 2, 1, 0], np.int32)
    dataio.write_parts_file(tmp_path / "g.parts", parts)
    got = dataio.read_parts_file(tmp_path / "g.parts")
    np.testing.assert_array_equal(got, parts)


def test_prepare_from_text(tmp_path):
    (tmp_path / "edges.txt").write_text("# comment\n0 1\n1 2\n2 0\n1 1\n")
    (tmp_path / "feats.txt").write_text("1 0\n0 1\n1 1\n")
    (tmp_path / "labels.txt").write_text("0\n1\n0\n")
    g = dataio.prepare_from_text(
        tmp_path / "edges.txt", tmp_path / "feats.txt", tmp_path / "labels.txt",
        tmp_path / "out", feature_dim=2, label_kinds=2)
    assert g.num_vertices == 3
    assert g.num_edges == 6  # 3 undirected pairs, self-loop dropped
    g2 = dataio.load_dataset(tmp_path / "out")
    assert g2.num_edges == 6
