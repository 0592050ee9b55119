from dorylus_tpu.ops.spmm import aggregate, spmm_edgewise  # noqa: F401
from dorylus_tpu.ops.activations import (  # noqa: F401
    leaky_relu,
    masked_softmax_xent,
    row_softmax,
)
