"""Layered configuration with the reference's exact keys and defaults.

Resolution order (chem_tensorflow.py:56-65): variant `default_params`
<- `--config-file` JSON <- `--config` inline JSON. The resolved dict is
archived per run and becomes part of the checkpoint contract (restore
asserts equality except task_ids/num_epochs, chem_tensorflow.py:336-340).

Key names match the reference verbatim so its configs (including the
R-GCN recipe from README.md:51) work unchanged.
"""

import json
from typing import Dict, Optional

# chem_tensorflow.py:19-37
BASE_DEFAULTS: Dict = {
    "num_epochs": 3000,
    "patience": 25,
    "learning_rate": 0.001,
    "clamp_gradient_norm": 1.0,
    "out_layer_dropout_keep_prob": 1.0,
    "hidden_size": 100,
    "num_timesteps": 4,
    "use_graph": True,
    "tie_fwd_bkwd": True,
    "task_ids": [0],
    "random_seed": 0,
    "train_file": "molecules_train.json",
    "valid_file": "molecules_valid.json",
}

# chem_tensorflow_sparse.py:40-61
SPARSE_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "batch_size": 100000,  # nodes
    "use_edge_bias": False,
    "use_propagation_attention": False,
    "use_edge_msg_avg_aggregation": True,
    "residual_connections": {"2": [0], "4": [0, 2]},
    "layer_timesteps": [2, 2, 1, 2, 1],
    "graph_rnn_cell": "GRU",
    "graph_rnn_activation": "tanh",
    "graph_state_dropout_keep_prob": 1.0,
    "task_sample_ratios": {},
    "edge_weight_dropout_keep_prob": 0.8,
    # TPU-native extras (not in the reference surface; see
    # models/sparse_ggnn.py): aggregate-before-transform is identical
    # math with ~E/N fewer matmul FLOPs; compute_dtype "bfloat16" runs
    # the message path on the MXU in bf16 with f32 accumulation.
    "aggregate_first": True,
    "compute_dtype": "float32",
    # (The round-1 `ell_block`/`ell_pallas`/`ell_sorted_vjp` keys were
    # removed: measurement showed every gather-based formulation shares
    # the same per-edge-row-access floor on v5e, so the default sorted-
    # XLA path is optimal for edge lists — see benchmarks/README.md and
    # ops/pallas/ell_spmm.py for the archived experiment.)
    #
    # Optional keys READ but deliberately not defaulted here (adding new
    # default keys would break the reference's checkpoint config-compat
    # assert for checkpoints written before the key existed):
    #   "pack_margin" (float, 1.05)  — packer/lane capacity headroom;
    #   "edge_parallelism" ("node_shard" | "type_tp") — edge-axis mesh
    #       strategy (parallel/node_shard.py / parallel/tp.py);
    #   "boundary_exchange" ("alltoall" | "shift" | "ragged" |
    #       "ragged_emulated" | "auto") — node-shard boundary
    #       transport: one dense all_to_all vs per-ring-shift ppermutes
    #       sized to each shift's worst pair vs ONE ragged_all_to_all
    #       moving the true per-pair sizes (TPU; _emulated validates
    #       the same layout on CPU); "auto" = ragged on TPU, shift
    #       elsewhere (parallel/node_shard.py);
    #   "locality_reorder" (bool, False) — DFS-preorder vertex
    #       relabeling for giant graphs (data/reorder.py);
    #   "edges_sorted_by_target", "combined_edge_lanes" — packer layout
    #       contract switches (models/sparse_ggnn.py);
    #   "async_remat" (bool, unset = auto) — rematerialize async
    #       substeps in the backward pass. Auto turns it on only when
    #       the saved-activation ESTIMATE exceeds ~1/6 of the device's
    #       free HBM (2.5 GiB fallback when the runtime exposes no
    #       memory stats; the estimate undercounts real residuals
    #       ~2-3x, so that is ~6-7 GiB live on a v5e). The reference
    #       100k-node budget needs it (17.8 GiB > 15.75 free); at the
    #       10-20k-node TPU sweet spot it costs ~1.5-2x step time for
    #       nothing — benchmarks/README.md. models/async_ggnn.py.
}

# chem_tensorflow_dense.py:56-66
DENSE_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "batch_size": 256,  # graphs
    "graph_state_dropout_keep_prob": 1.0,
    "task_sample_ratios": {},
    "use_edge_bias": True,
    "edge_weight_dropout_keep_prob": 1,
}

# chem_tensorflow_gcn.py:32-40
GCN_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "batch_size": 100000,  # nodes
    "task_sample_ratios": {},
    "gcn_use_bias": False,
    "graph_state_dropout_keep_prob": 1.0,
}

# chem_tensorflow_async.py:41-57
ASYNC_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "num_nodes": 100000,  # node budget
    "use_edge_bias": False,
    "propagation_rounds": 4,
    "propagation_substeps": 15,
    "graph_rnn_cell": "GRU",
    "graph_rnn_activation": "tanh",
    "graph_state_dropout_keep_prob": 1.0,
    "task_sample_ratios": {},
}

# TPU-first extra variant: the full sparse feature surface (layers,
# residuals, attention, avg aggregation, cells) computed on the dense
# block-diagonal path (models/dense_ggnn.py extended mode) — ~10x faster
# per graph than edge-list scatter/gather for bucketable molecules.
BLOCKED_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "batch_size": 256,  # graphs (dense bucketed batching)
    "use_edge_bias": False,
    "use_propagation_attention": False,
    "use_edge_msg_avg_aggregation": True,
    "residual_connections": {"2": [0], "4": [0, 2]},
    "layer_timesteps": [2, 2, 1, 2, 1],
    "graph_rnn_cell": "GRU",
    "graph_rnn_activation": "tanh",
    "graph_state_dropout_keep_prob": 1.0,
    "task_sample_ratios": {},
    "edge_weight_dropout_keep_prob": 0.8,
    # Coarse buckets: same math (padding is masked), 4 compiled shapes
    # instead of the reference's 13 (XLA compiles per bucket shape).
    "dense_bucket_sizes": [8, 16, 24, 32],
}

# TPU-first extra variant: GCN math (models/gcn.py:BlockedGCN) on the
# bucketed dense path — the edge-list GCN step is scatter-latency-bound
# (benchmarks/roofline.py: 1.8% of the MXU rate), the dense [B,V,V]
# contraction is not.
GCN_BLOCKED_DEFAULTS: Dict = {
    **BASE_DEFAULTS,
    "batch_size": 256,  # graphs (dense bucketed batching)
    "task_sample_ratios": {},
    "gcn_use_bias": False,
    "graph_state_dropout_keep_prob": 1.0,
    # Coarse buckets: same math (padding is masked), 4 compiled shapes.
    "dense_bucket_sizes": [8, 16, 24, 32],
}

# README.md:48-52 — R-GCN is the sparse model under this config.
RGCN_CONFIG: Dict = {
    "use_edge_bias": False,
    "use_edge_msg_avg_aggregation": True,
    "residual_connections": {},
    "layer_timesteps": [1, 1, 1, 1, 1, 1, 1, 1],
    "graph_rnn_cell": "RNN",
    "graph_rnn_activation": "ReLU",
}

_VARIANT_DEFAULTS = {
    "sparse": SPARSE_DEFAULTS,
    "dense": DENSE_DEFAULTS,
    "blocked": BLOCKED_DEFAULTS,
    "gcn": GCN_DEFAULTS,
    "gcn_blocked": GCN_BLOCKED_DEFAULTS,
    "async": ASYNC_DEFAULTS,
}


def default_params_for(variant: str) -> Dict:
    import copy
    if variant == "rgcn":
        return copy.deepcopy({**SPARSE_DEFAULTS, **RGCN_CONFIG})
    if variant not in _VARIANT_DEFAULTS:
        raise ValueError(f"unknown model variant '{variant}'")
    # DEEP copy: the defaults hold nested mutables (task_sample_ratios,
    # layer_timesteps, residual_connections, ...) — a shallow copy let
    # `cfg["task_sample_ratios"]["0"] = r` mutate the MODULE constant,
    # silently leaking into every later config of the process and into
    # archived checkpoints (round-5 review, reproduced).
    return copy.deepcopy(_VARIANT_DEFAULTS[variant])


def resolve_config(variant: str, config_file: Optional[str] = None,
                   config_json: Optional[str] = None) -> Dict:
    params = default_params_for(variant)
    if config_file is not None:
        with open(config_file, "r") as f:
            params.update(json.load(f))
    if config_json is not None:
        params.update(json.loads(config_json))
    return params
