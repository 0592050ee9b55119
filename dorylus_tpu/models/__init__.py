from dorylus_tpu.models.gcn import GCN  # noqa: F401
from dorylus_tpu.models.gat import GAT  # noqa: F401
