"""Asynchronous GGNN with DAG-scheduled propagation.

TPU-native re-design of chem_tensorflow_async.py:59-218. The reference
drives a `tf.while_loop` over TensorArrays with early exit on empty
substeps; under XLA we run a `lax.scan` over `propagation_substeps`
fixed-shape substep slices — empty steps are masked no-ops whose writes
land in dump slots (same results, one compiled program).

Per round: a fresh state buffer is seeded with the round's initial nodes'
previous-round states; each substep gathers sender states from the
*current* buffer (the async property: messages see already-updated
states, async.py:183), transforms per edge type, segment-sums into the
step's receiver set, combines with the receivers' *previous-round* states
in the shared RNN cell, and scatters the updates back. Weights are one
[H, H] matrix (+ optional bias) per edge type shared across rounds/steps,
and one shared cell (async.py:112-129).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ggnn_tpu.graph import AsyncGraphBatch
from ggnn_tpu.models import base
from ggnn_tpu.ops.cells import make_cell
from ggnn_tpu.ops.segment import segment_sum
from ggnn_tpu.utils.init import glorot_init


class AsyncGGNN:
    def __init__(self, config: Dict, num_edge_types: int):
        self.config = config
        self.num_edge_types = num_edge_types
        self.hidden_size = config["hidden_size"]
        self.propagation_rounds = config["propagation_rounds"]
        self.propagation_substeps = config["propagation_substeps"]
        self.use_edge_bias = config["use_edge_bias"]
        cell_type = config["graph_rnn_cell"]
        if cell_type.lower() not in ("gru", "rnn"):
            raise ValueError(f"Unknown RNN cell type '{cell_type}'.")
        self.cell_init, self.cell_apply = make_cell(
            cell_type, config["graph_rnn_activation"],
            config["graph_state_dropout_keep_prob"])

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        t = self.num_edge_types
        k_w, k_cell = jax.random.split(key)
        # Per-type [H, H] weights drawn independently (async.py:113-114).
        keys = jax.random.split(k_w, t)
        params = {
            "edge_weights": jnp.stack([glorot_init(k, (h, h)) for k in keys]),
            "cell": self.cell_init(k_cell, h, h),
        }
        if self.use_edge_bias:
            params["edge_biases"] = jnp.zeros((t, h), jnp.float32)
        return params

    def forward(self, params: Dict, batch: AsyncGraphBatch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        if (getattr(batch, "send_compact", None) is not None
                and self.config.get("async_compact", True)):
            return self._forward_compact(params, batch, rng=rng,
                                         is_training=is_training)
        n_cap = batch.node_capacity
        h_dim = self.hidden_size
        rc_cap = batch.receiving_nodes.shape[-1]
        # Extended buffers carry a dump row at index n_cap so padded
        # initial/receiving slots scatter/gather harmlessly.
        cur_ext = jnp.concatenate(
            [batch.node_features, jnp.zeros((1, h_dim))], axis=0)

        for prop_round in range(self.propagation_rounds):
            init_ids = batch.initial_nodes[prop_round]
            new_ext = jnp.zeros((n_cap + 1, h_dim))
            new_ext = new_ext.at[init_ids].set(cur_ext[init_ids])

            if rng is not None:
                rng, round_rng = jax.random.split(rng)
            else:
                round_rng = jax.random.PRNGKey(0)  # unused when not training
            step_rngs = jax.random.split(round_rng, self.propagation_substeps)

            def substep(new_ext, inputs):
                sending, msg_tgt, receiving, step_rng = inputs
                # sending/msg_tgt: [T, SE]; receiving: [RC]
                send_states = new_ext[sending]                  # [T, SE, H]
                msgs = jnp.einsum(
                    "teh,thd->ted", send_states, params["edge_weights"],
                    preferred_element_type=jnp.float32)
                if self.use_edge_bias:
                    msgs = msgs + params["edge_biases"][:, None, :]
                t, se, _ = msgs.shape
                agg = segment_sum(
                    msgs.reshape(t * se, h_dim), msg_tgt.reshape(t * se),
                    rc_cap + 1)[:rc_cap]                        # [RC, H]
                old = cur_ext[receiving]                        # [RC, H]
                new_h = self.cell_apply(
                    params["cell"], agg, old,
                    rng=step_rng, is_training=is_training)
                new_ext2 = new_ext.at[receiving].set(new_h)
                return new_ext2, None

            new_ext, _ = jax.lax.scan(
                substep, new_ext,
                (batch.sending_nodes[prop_round],
                 batch.msg_targets[prop_round],
                 batch.receiving_nodes[prop_round],
                 step_rngs))
            cur_ext = new_ext.at[n_cap].set(0.0)

        return cur_ext[:n_cap]

    def _forward_compact(self, params: Dict, batch: AsyncGraphBatch, *,
                         rng=None, is_training: bool = False) -> jax.Array:
        """Compact-buffer propagation (the fast path).

        The plain path scatters each substep's receiver updates into the
        full [N+1, H] node buffer — 40MB of read-modify-write traffic
        per substep at the 100k-node budget, for RC-row payloads. Here
        every round's states live in a compact slot space (initial nodes
        first, then receivers at cumulative per-step offsets, see
        data/async_schedule.py), so a substep writes ONE contiguous
        [RC, H] `dynamic_update_slice` and all gathers index subsets.
        Padding lanes overwrite slots that a later step rewrites before
        anyone reads them; nothing ever reads a stale slot (senders only
        reference receivers of strictly earlier steps or initial nodes).
        """
        n_cap = batch.node_capacity
        h_dim = self.hidden_size
        i_cap = batch.initial_nodes.shape[-1]
        rc_cap = batch.receiving_nodes.shape[-1]
        m_dump = i_cap + n_cap + rc_cap
        feats_ext = jnp.concatenate(
            [batch.node_features, jnp.zeros((1, h_dim))], axis=0)

        prev_buf = feats_ext  # round 0 reads prev states by global id
        for prop_round in range(self.propagation_rounds):
            if rng is not None:
                rng, round_rng = jax.random.split(rng)
            else:
                round_rng = jax.random.PRNGKey(0)  # unused when not training
            step_rngs = jax.random.split(round_rng, self.propagation_substeps)

            buf = jnp.zeros((m_dump + 1, h_dim))
            buf = buf.at[:i_cap].set(prev_buf[batch.init_prev[prop_round]])

            def substep(buf, inputs, prev_buf=prev_buf):
                send_c, msg_tgt, old_idx, base, step_rng = inputs
                send_states = buf[send_c]                       # [T, SE, H]
                msgs = jnp.einsum(
                    "teh,thd->ted", send_states, params["edge_weights"],
                    preferred_element_type=jnp.float32)
                if self.use_edge_bias:
                    msgs = msgs + params["edge_biases"][:, None, :]
                t, se, _ = msgs.shape
                agg = segment_sum(
                    msgs.reshape(t * se, h_dim), msg_tgt.reshape(t * se),
                    rc_cap + 1)[:rc_cap]                        # [RC, H]
                old = prev_buf[old_idx]                         # [RC, H]
                new_h = self.cell_apply(
                    params["cell"], agg, old,
                    rng=step_rng, is_training=is_training)
                buf = jax.lax.dynamic_update_slice(
                    buf, new_h, (i_cap + base, 0))
                return buf, None

            buf, _ = jax.lax.scan(
                substep, buf,
                (batch.send_compact[prop_round],
                 batch.msg_targets[prop_round],
                 batch.old_compact[prop_round],
                 batch.recv_base[prop_round],
                 step_rngs))
            prev_buf = buf.at[m_dump].set(0.0)

        return prev_buf[batch.final_compact]

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: AsyncGraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        outs = []
        for task_id in task_ids:
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            gated = base.gated_regression_nodes(
                heads[f"task{task_id}"], last_h, batch.node_features,
                keep_prob=keep_prob, rng=sub)
            outs.append(base.pool_nodes_to_graphs(
                gated, batch.node_graph_ids, batch.graph_capacity))
        return jnp.stack(outs, axis=0)
