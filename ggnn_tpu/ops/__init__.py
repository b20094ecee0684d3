from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.ops.cells import (
    gru_init, gru_apply,
    cudnn_gru_init, cudnn_gru_apply,
    rnn_init, rnn_apply,
    make_cell,
)
from ggnn_tpu.ops.mlp import mlp_init, mlp_apply
from ggnn_tpu.ops.segment import segment_sum, segment_max, segment_softmax
