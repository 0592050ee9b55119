"""Real multi-process test: 2 OS processes, jax.distributed, one mesh.

The reference's NodeManager handshake (nodemanager.cpp:56-107) was its most
failure-prone bring-up code; its analog here (multihost.init_multihost over
jax.distributed) must actually execute its non-trivial branch, not just
no-op in single-process mode. Each child claims 2 virtual CPU devices, so
the sharded step's psum and halo all_to_all cross a process boundary.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

CHILD = Path(__file__).parent / "_multiproc_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


import pytest


@pytest.mark.parametrize("kernel", ["auto", "hyb"])
def test_two_process_sharded_step(kernel):
    port = _free_port()
    nprocs, dpp = 2, 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(CHILD), str(rank), str(nprocs), str(port),
             str(dpp), kernel],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for rank in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # Replicated loss must agree bit-for-bit across processes (it is the
    # same psum on every device of the same compiled program).
    assert outs[0]["losses"] == outs[1]["losses"]
    assert len(outs[0]["losses"]) == 3
