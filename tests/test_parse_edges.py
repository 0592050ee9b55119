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


# Round-5 review: the two parsers previously DIVERGED on these (python
# int() accepted '-1' and rejected '2.5'-suffixed tokens; native wrapped
# ids >= 2^31 into negative int32 that corrupt downstream counting
# sorts). The unified rule: leading digit run, whitespace, digit run,
# rest-of-line ignored; negatives, non-digit first-token suffixes and
# ids >= 2^31 drop the line.
ADVERSARIAL = """1 2.5
-1 2
1 -2
3000000000 5
5 3000000000
99999999999999999999 7
12x 5
12 5x
2147483647 1
2147483648 1
"""

ADV_WANT = [(1, 2), (12, 5), (2147483647, 1)]


def test_python_fallback_adversarial(tmp_path):
    p = tmp_path / "adv.txt"
    p.write_text(ADVERSARIAL)
    s, d = _read_text_edges_py(p)
    assert list(zip(s.tolist(), d.tolist())) == ADV_WANT
    assert (s >= 0).all() and (d >= 0).all()


def test_native_parser_adversarial(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "adv.txt"
    p.write_text(ADVERSARIAL)
    s, d = native.parse_edges(p)
    assert list(zip(s.tolist(), d.tolist())) == ADV_WANT
    assert (s >= 0).all() and (d >= 0).all()
