from dorylus_tpu.parallel.mesh import make_mesh  # noqa: F401
from dorylus_tpu.parallel.train_step import ShardedEngine, build_sharded_train_step  # noqa: F401
