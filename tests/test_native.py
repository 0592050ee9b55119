"""Native graphcore library vs numpy fallbacks (builds the .so if absent)."""

import numpy as np
import pytest

from dorylus_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("g++/native build unavailable")
    return True


def test_sort_by_dst(lib_ok):
    rng = np.random.default_rng(0)
    dst = rng.integers(0, 100, 5000).astype(np.int32)
    order = native.sort_by_dst(dst, 100)
    assert (np.diff(dst[order]) >= 0).all()
    # stability: within equal dst, original index order preserved
    for v in (0, 17, 99):
        sel = order[dst[order] == v]
        assert (np.diff(sel) > 0).all()


def test_gcn_norms_match_numpy(lib_ok):
    rng = np.random.default_rng(1)
    src = rng.integers(0, 200, 3000).astype(np.int32)
    dst = rng.integers(0, 200, 3000).astype(np.int32)
    deg, en, sn = native.gcn_norms(src, dst, 200)
    want_deg = np.bincount(dst, minlength=200)
    np.testing.assert_array_equal(deg, want_deg)
    inv = (want_deg + 1.0) ** -0.5
    np.testing.assert_allclose(en, (inv[src] * inv[dst]).astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(sn, ((want_deg + 1.0) ** -1).astype(np.float32),
                               rtol=1e-6)


def test_sort_by_key64(lib_ok):
    rng = np.random.default_rng(2)
    key = rng.integers(0, 1 << 40, 10000).astype(np.uint64)
    order = native.sort_by_key64(key)
    np.testing.assert_array_equal(key[order], np.sort(key))
    want = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(order, want)


def test_ldg_partition_balance_and_locality(lib_ok):
    rng = np.random.default_rng(3)
    # Two clear communities.
    v = 400
    src = np.r_[rng.integers(0, 200, 3000), rng.integers(200, 400, 3000)]
    dst = np.r_[rng.integers(0, 200, 3000), rng.integers(200, 400, 3000)]
    parts = native.ldg_partition(src.astype(np.int32), dst.astype(np.int32),
                                 v, 2)
    sizes = np.bincount(parts, minlength=2)
    assert sizes.min() > v * 0.3  # balanced-ish
    cut = (parts[src] != parts[dst]).mean()
    assert cut < 0.3  # far better than random (0.5)

