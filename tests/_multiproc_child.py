"""Child process for test_multiprocess.py: one of N jax.distributed
processes running a real cross-process sharded training step on CPU.

This exercises the non-trivial branch of parallel/multihost.init_multihost —
the analog of the reference NodeManager's master/worker ZMQ handshake
(nodemanager.cpp:56-107), its most failure-prone bring-up path — plus
cross-process psum + all_to_all (halo) inside one compiled step.

Usage: python _multiproc_child.py <rank> <nprocs> <port> <devices_per_proc>
           [kernel]
Prints one JSON line with the losses so the parent can assert agreement.
"""

import json
import os
import sys

rank, nprocs, port, dpp = (int(a) for a in sys.argv[1:5])
kernel = sys.argv[5] if len(sys.argv) > 5 else "auto"

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={dpp}")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dorylus_tpu.parallel.multihost import global_mesh, init_multihost  # noqa: E402

init_multihost(f"localhost:{port}", nprocs, rank)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == nprocs * dpp

from dorylus_tpu.common.config import LayerConfig, TrainConfig  # noqa: E402
from dorylus_tpu.graph.graph import synthetic_graph  # noqa: E402
from dorylus_tpu.parallel.train_step import ShardedEngine  # noqa: E402

# Every process builds the same global graph deterministically (the
# dshmachines contract: same program, same inputs, rank from the runtime).
g = synthetic_graph(256, 6, 16, 5, seed=3)
layers = LayerConfig([16, 8, 5])
cfg = TrainConfig(epochs=3, eval_every=0, num_shards=nprocs * dpp,
                  kernel=kernel)
eng = ShardedEngine(g, layers, cfg, mesh=global_mesh())
report = eng.run()
print(json.dumps({"rank": rank,
                  "losses": [e.loss for e in report.epochs]}), flush=True)
