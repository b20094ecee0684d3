from ggnn_tpu.models.base import (
    init_output_heads,
    gated_regression_nodes,
    masked_regression_loss,
)
from ggnn_tpu.models.sparse_ggnn import SparseGGNN
from ggnn_tpu.models.dense_ggnn import DenseGGNN
from ggnn_tpu.models.gcn import GCN
from ggnn_tpu.models.async_ggnn import AsyncGGNN
