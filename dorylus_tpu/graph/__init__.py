from dorylus_tpu.graph.graph import Graph  # noqa: F401
from dorylus_tpu.graph.partition import ShardedGraph, partition_graph  # noqa: F401
