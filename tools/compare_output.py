"""Per-vertex output differ — port of miscs/compare_output.py.

Compares two prediction dumps (one line of floats per vertex, e.g. from
Engine.dump_predictions) line-sum-wise with a threshold, reporting the
first divergence and total mismatch count (compare_output.py:19-43
semantics, default threshold 1e-4).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compare(path_a: str, path_b: str, threshold: float = 1e-4) -> int:
    a = np.loadtxt(path_a)
    b = np.loadtxt(path_b)
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    sums_a = a.sum(axis=1) if a.ndim > 1 else a
    sums_b = b.sum(axis=1) if b.ndim > 1 else b
    diff = np.abs(sums_a - sums_b)
    bad = np.flatnonzero(diff > threshold)
    if len(bad):
        print(f"{len(bad)} / {len(diff)} vertices differ by > {threshold}; "
              f"first at line {bad[0]} (|d|={diff[bad[0]]:.3e}, "
              f"max |d|={diff.max():.3e})")
        return 1
    print(f"outputs match: {len(diff)} vertices, max |d|={diff.max():.3e}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--threshold", type=float, default=1e-4)
    args = ap.parse_args()
    return compare(args.a, args.b, args.threshold)


if __name__ == "__main__":
    sys.exit(main())
