from ggnn_tpu.training.config import (
    BASE_DEFAULTS, SPARSE_DEFAULTS, DENSE_DEFAULTS, GCN_DEFAULTS,
    ASYNC_DEFAULTS, RGCN_CONFIG, resolve_config, default_params_for,
)
from ggnn_tpu.training.optimizer import clip_by_norm_per_leaf, tf_adam, make_optimizer
from ggnn_tpu.training.checkpoint import save_checkpoint, restore_checkpoint
