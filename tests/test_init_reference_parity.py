"""Bit-parity of weight initializers vs libstdc++, verified by compiling a
tiny C++ probe with the exact reference code pattern
(weightserver.cpp:567-612: default_random_engine(8888) + uniform/normal)."""

import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from dorylus_tpu.models.init import MinStd0, kaiming_reference, xavier_reference

CPP = textwrap.dedent("""
    #include <cstdio>
    #include <random>
    #include <cmath>
    int main() {
        { // xavier pattern
            std::default_random_engine dre(8888);
            std::uniform_real_distribution<float> dist(-1, 1);
            for (int i = 0; i < 16; ++i) printf("%.9g\\n", dist(dre));
        }
        { // kaiming pattern
            std::default_random_engine dre(8888);
            std::normal_distribution<float> dist(0, 1);
            for (int i = 0; i < 16; ++i) printf("%.9g\\n", dist(dre));
        }
        return 0;
    }
""")


@pytest.fixture(scope="module")
def cpp_values(tmp_path_factory):
    d = tmp_path_factory.mktemp("cpp")
    src = d / "probe.cpp"
    src.write_text(CPP)
    exe = d / "probe"
    try:
        subprocess.run(["g++", "-O2", "-o", str(exe), str(src)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("g++ unavailable")
    out = subprocess.run([str(exe)], check=True, capture_output=True, text=True)
    vals = [float(x) for x in out.stdout.split()]
    return np.array(vals[:16]), np.array(vals[16:])


def test_uniform_matches_libstdcxx(cpp_values):
    uni, _ = cpp_values
    rng = MinStd0(8888)
    ours = np.array([rng.uniform(-1, 1) for _ in range(16)])
    np.testing.assert_allclose(ours, uni, rtol=1e-6)


def test_normal_matches_libstdcxx(cpp_values):
    _, nrm = cpp_values
    k = kaiming_reference(16, 1, seed=8888)[:, 0] / np.sqrt(2.0 / 16)
    np.testing.assert_allclose(k, nrm, rtol=1e-5, atol=1e-7)


def test_xavier_scale():
    w = xavier_reference(8, 4)
    bound = np.sqrt(6.0 / 12)
    assert np.abs(w).max() <= bound
    assert w.shape == (8, 4)
