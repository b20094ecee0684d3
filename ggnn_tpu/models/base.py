"""Model-agnostic output heads and loss scaffold.

Reproduces the reference's per-task gated regression + masked loss
(chem_tensorflow.py:133-170):

  head(task):  sigmoid(MLP_gate([h_final ‖ h_init])) * MLP_transform(h_final)
  pooled per graph (segment-sum for packed batches, masked sum for dense)
  accuracy = Σ|masked diff| / (Σ mask + ε)            # masked MAE
  loss     = Σ 0.5 · (masked diff)² / (Σ mask + ε)    # per-task, then rescaled
             × 1 / (task_sample_ratios.get(task_id) or 1.0)
  total    = Σ_task loss

Note the rescale looks the ratio up by *integer* task id
(chem_tensorflow.py:168) while the samplers blank labels by *string* id —
a reference quirk kept as-is (JSON configs always produce string keys, so
the rescale is effectively 1.0 for them, exactly like upstream).
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ggnn_tpu.ops.mlp import mlp_apply, mlp_init
from ggnn_tpu.ops.segment import segment_sum
from ggnn_tpu.utils.constants import SMALL_NUMBER


def init_output_heads(key: jax.Array, hidden_size: int,
                      task_ids: Sequence[int]) -> Dict:
    """One gate + transform MLP pair per task (chem_tensorflow.py:149-157).

    Defaults are single linear layers: gate sees [h_final ‖ h_init] (2H),
    transform sees h_final (H); both map to 1.
    """
    heads = {}
    for task_id in task_ids:
        key, k1, k2 = jax.random.split(key, 3)
        heads[f"task{task_id}"] = {
            "gate": mlp_init(k1, 2 * hidden_size, 1),
            "transform": mlp_init(k2, hidden_size, 1),
        }
    return heads


def gated_regression_nodes(head: Dict, last_h: jax.Array, initial_h: jax.Array,
                           *, keep_prob: float = 1.0, rng=None) -> jax.Array:
    """Per-node gated output [..., 1] (shared by all sparse variants)."""
    gate_input = jnp.concatenate([last_h, initial_h], axis=-1)
    if rng is not None:
        rng_gate, rng_tr = jax.random.split(rng)
    else:
        rng_gate = rng_tr = None
    gate = jax.nn.sigmoid(
        mlp_apply(head["gate"], gate_input, keep_prob=keep_prob, rng=rng_gate))
    transform = mlp_apply(head["transform"], last_h, keep_prob=keep_prob,
                          rng=rng_tr)
    return gate * transform


def pool_nodes_to_graphs(gated: jax.Array, node_graph_ids: jax.Array,
                         graph_capacity: int) -> jax.Array:
    """Segment-sum node outputs into graph scalars [G] (sparse readout).

    Padded nodes carry the dump graph id `graph_capacity`, so the extra
    segment absorbs them and is sliced off.
    """
    pooled = segment_sum(gated, node_graph_ids, graph_capacity + 1)
    return pooled[:graph_capacity, 0]


def segment_readout(heads: Dict, task_ids, last_h: jax.Array,
                    init_features: jax.Array, node_graph_ids: jax.Array,
                    graph_capacity: int, *, keep_prob: float = 1.0,
                    rng=None, psum_axis=None) -> jax.Array:
    """Per-task gated segment-sum pooling [K, G] — THE readout for the
    edge-list variants (sparse/GCN/async share it; round-5 review
    collapsed five near-identical copies onto this + dense_readout).
    `psum_axis` combines per-shard partial pools for node-sharded
    batches (a graph may span shards)."""
    outs = []
    for task_id in task_ids:
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        gated = gated_regression_nodes(
            heads[f"task{task_id}"], last_h, init_features,
            keep_prob=keep_prob, rng=sub)
        outs.append(pool_nodes_to_graphs(gated, node_graph_ids,
                                         graph_capacity))
    out = jnp.stack(outs, axis=0)
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    return out


def dense_readout(heads: Dict, task_ids, last_h: jax.Array,
                  init_features: jax.Array, node_mask: jax.Array, *,
                  keep_prob: float = 1.0, rng=None) -> jax.Array:
    """Per-task gated masked-sum pooling [K, B] — the dense-path form
    (dense.py:119-129), shared by DenseGGNN and BlockedGCN."""
    b, v, d = last_h.shape
    flat_last = last_h.reshape(b * v, d)
    flat_init = init_features.reshape(b * v, d)
    outs = []
    for task_id in task_ids:
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        gated = gated_regression_nodes(
            heads[f"task{task_id}"], flat_last, flat_init,
            keep_prob=keep_prob, rng=sub)               # [B*V, 1]
        outs.append(jnp.sum(gated.reshape(b, v) * node_mask, axis=1))
    return jnp.stack(outs, axis=0)


def masked_regression_loss(computed: jax.Array, targets: jax.Array,
                           target_mask: jax.Array, task_ids: Sequence[int],
                           task_sample_ratios: Dict) -> Tuple[jax.Array, jax.Array]:
    """Total loss and per-task masked MAE over a [K, G] prediction block."""
    diff = (computed - targets) * target_mask
    task_target_num = jnp.sum(target_mask, axis=1) + SMALL_NUMBER
    accuracies = jnp.sum(jnp.abs(diff), axis=1) / task_target_num
    task_losses = jnp.sum(0.5 * jnp.square(diff), axis=1) / task_target_num
    rescale = jnp.array(
        [1.0 / (task_sample_ratios.get(task_id) or 1.0) for task_id in task_ids],
        dtype=jnp.float32,
    )
    loss = jnp.sum(task_losses * rescale)
    return loss, accuracies


_ACTIVATIONS = {"tanh": jnp.tanh, "relu": jax.nn.relu}


def get_activation(name: str):
    key = name.lower()
    if key not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation function type '{name}'.")
    return _ACTIVATIONS[key]
