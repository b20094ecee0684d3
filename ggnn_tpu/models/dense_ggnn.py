"""Dense GGNN over bucketed per-edge-type adjacency tensors.

TPU-native re-design of chem_tensorflow_dense.py:52-129. Batches are
dense [B, T, V, V] adjacency stacks (V <= 29 for QM9) — ideal MXU food.
One propagation step:

    m[b,t,v,:] = h[b,v,:] @ W[t]  (+ bias[t])     einsum('bvh,thd->btvd')
    acts[b,v,:] = sum_t A[b,t,v,:] @ m[b,t,:,:]   einsum('btvw,btwd->bvd')
    h = GRU(acts, h)                               shared cell, all steps

The adjacency is oriented A[b, t, dst, src] = 1 (dense.py:30-36), so the
contraction over `w` sums over message *sources*. The GRU cell is shared
across all `num_timesteps` steps (TF scope reuse, dense.py:99-115); edge
weight dropout draws a fresh mask per (timestep, edge-type) like the
reference's per-op dropout inside the unrolled loop (dense.py:104).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ggnn_tpu.graph import DenseGraphBatch
from ggnn_tpu.models import base
from ggnn_tpu.ops.cells import make_cell
from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.utils.init import glorot_init


class DenseGGNN:
    def __init__(self, config: Dict, num_edge_types: int):
        self.config = config
        self.num_edge_types = num_edge_types
        self.hidden_size = config["hidden_size"]
        self.num_timesteps = config["num_timesteps"]
        self.use_edge_bias = config["use_edge_bias"]
        self.edge_weight_dropout_keep_prob = config["edge_weight_dropout_keep_prob"]
        # Dense variant hard-codes a tanh GRU (tf.contrib.rnn.GRUCell,
        # dense.py:88) wrapped in state dropout.
        self.cell_init, self.cell_apply = make_cell(
            "gru", "tanh", config["graph_state_dropout_keep_prob"])

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        t = self.num_edge_types
        k_w, k_cell = jax.random.split(key)
        params = {
            "edge_weights": glorot_init(k_w, (t, h, h)),
            "cell": self.cell_init(k_cell, h, h),
        }
        if self.use_edge_bias:
            params["edge_biases"] = jnp.zeros((t, 1, h), jnp.float32)
        return params

    def forward(self, params: Dict, batch: DenseGraphBatch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        """Final node representations [B, V, H]."""
        h = batch.node_features  # [B, V, H]
        for _step in range(self.num_timesteps):
            w = params["edge_weights"]  # [T, H, H]
            if is_training and self.edge_weight_dropout_keep_prob < 1.0:
                rng, rng_w = jax.random.split(rng)
                w = dropout(rng_w, w, self.edge_weight_dropout_keep_prob)
            m = jnp.einsum("bvh,thd->btvd", h, w,
                           preferred_element_type=jnp.float32)
            if self.use_edge_bias:
                m = m + params["edge_biases"][None]  # [T,1,H] broadcasts
            acts = jnp.einsum("btvw,btwd->bvd", batch.adjacency, m,
                              preferred_element_type=jnp.float32)
            if rng is not None:
                rng, rng_cell = jax.random.split(rng)
            else:
                rng_cell = None
            b, v, d = h.shape
            h = self.cell_apply(
                params["cell"], acts.reshape(b * v, d), h.reshape(b * v, d),
                rng=rng_cell, is_training=is_training).reshape(b, v, d)
        return h

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: DenseGraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        """Per-task graph predictions [K, B]: gated node outputs, masked by
        node_mask, summed per graph (dense.py:119-129)."""
        b, v, d = last_h.shape
        flat_last = last_h.reshape(b * v, d)
        flat_init = batch.node_features.reshape(b * v, d)
        outs = []
        for task_id in task_ids:
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            gated = base.gated_regression_nodes(
                heads[f"task{task_id}"], flat_last, flat_init,
                keep_prob=keep_prob, rng=sub)          # [B*V, 1]
            masked = gated.reshape(b, v) * batch.node_mask
            outs.append(jnp.sum(masked, axis=1))        # [B]
        return jnp.stack(outs, axis=0)
