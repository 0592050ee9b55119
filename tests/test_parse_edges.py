"""Native text edge-list parser == python fallback (graphToBinary.cpp
readFile semantics: '#'/'%' comments, first two int columns, self loops
and malformed lines dropped)."""

import os
import tempfile

import numpy as np
import pytest

from dorylus_tpu import native
from dorylus_tpu.graph.dataio import _read_text_edges_py, read_text_edges

TRICKY = """# comment line
% another comment
0 1
1 2 extra_col 99
3 3
5\t7
   8 9
10 11
bogus line
12
13 14"""

WANT = [(0, 1), (1, 2), (5, 7), (8, 9), (10, 11), (13, 14)]


@pytest.fixture
def tricky_file(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text(TRICKY)
    return p


def test_python_fallback_semantics(tricky_file):
    s, d = _read_text_edges_py(tricky_file)
    assert list(zip(s.tolist(), d.tolist())) == WANT


def test_native_parser_matches_fallback(tricky_file):
    if not native.available():
        pytest.skip("native library unavailable")
    s, d = native.parse_edges(tricky_file)
    assert list(zip(s.tolist(), d.tolist())) == WANT


def test_dispatch_and_bulk_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    e = 50_000
    src = rng.integers(0, 10_000, e)
    dst = rng.integers(0, 10_000, e)
    p = tmp_path / "big.txt"
    np.savetxt(p, np.c_[src, dst], fmt="%d")
    s, d = read_text_edges(p)
    keep = src != dst
    assert (s == src[keep]).all() and (d == dst[keep]).all()


def test_empty_file(tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    s, d = read_text_edges(p)
    assert len(s) == 0 and len(d) == 0
