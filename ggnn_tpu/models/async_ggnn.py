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
        # Auto-remat HBM budget, snapshotted ONCE at the first forward
        # trace (lazily — see _get_remat_limit): a per-trace read of
        # free HBM would let the same config compile with or without
        # remat depending on what happens to be resident when a shape
        # is (re)traced — nondeterministic step time/memory across
        # runs; a construction-time read would run BEFORE params and
        # optimizer state are allocated and systematically overestimate
        # the free pool. ~1/6 of free HBM when the runtime exposes it,
        # else the v5e-calibrated 2.5 GiB estimate.
        self._remat_limit = None

    def _get_remat_limit(self) -> int:
        """Remat HBM budget, snapshotted on first use (the first
        forward trace — after the caller has allocated params and
        optimizer state) and frozen thereafter so the policy is
        deterministic across traces within a run."""
        if self._remat_limit is None:
            limit = int(2.5 * 2**30)
            try:
                stats = jax.devices()[0].memory_stats() or {}
                free = (stats.get("bytes_limit", 0)
                        - stats.get("bytes_in_use", 0))
                if free > 0:
                    limit = free // 6
            except Exception:
                pass
            self._remat_limit = limit
        return self._remat_limit

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        t = self.num_edge_types
        k_w, k_cell = jax.random.split(key)
        # Per-type [H, H] weights as SEPARATE leaves, matching the
        # reference's per-type tf.Variables (async.py:113-118): the
        # optimizer's per-leaf clip-by-norm then reproduces the
        # reference's per-VARIABLE tf.clip_by_norm exactly (pinned by
        # the async TF1 golden fixtures). Forward stacks them; a legacy
        # stacked [T, H, H] array still works (jnp.stack is identity).
        keys = jax.random.split(k_w, t)
        params = {
            "edge_weights": [glorot_init(k, (h, h)) for k in keys],
            "cell": self.cell_init(k_cell, h, h),
        }
        if self.use_edge_bias:
            params["edge_biases"] = [jnp.zeros((h,), jnp.float32)
                                     for _ in range(t)]
        return params

    @staticmethod
    def _stacked(params: Dict):
        ew = jnp.stack(params["edge_weights"])
        eb = (jnp.stack(params["edge_biases"])
              if "edge_biases" in params else None)
        return ew, eb

    def forward(self, params: Dict, batch: AsyncGraphBatch, *, rng=None,
                is_training: bool = False,
                return_all_rounds: bool = False):
        if (rng is None and is_training
                and self.config["graph_state_dropout_keep_prob"] < 1.0):
            # Same loud contract as the other models' cells: the
            # PRNGKey(0) placeholder below would otherwise reuse ONE
            # fixed dropout mask for every round/step/batch of the run
            # — silently correlated dropout (round-5 review).
            raise ValueError(
                "state dropout requires an rng key "
                "(is_training=True with graph_state_dropout_keep_prob "
                "< 1 and rng=None)")
        if return_all_rounds:
            # Per-round states are only exposed by the plain path (the
            # segmented path's compact buffers don't hold a full
            # [N, H] per-round view) — used by the TF1 golden replay.
            return self._forward_plain(params, batch, rng=rng,
                                       is_training=is_training,
                                       return_all_rounds=True)
        if (getattr(batch, "seg_rounds", None) is not None
                and self.config.get("async_compact", True)):
            return self._forward_segmented(params, batch, rng=rng,
                                           is_training=is_training)
        return self._forward_plain(params, batch, rng=rng,
                                   is_training=is_training)

    def _forward_plain(self, params: Dict, batch: AsyncGraphBatch, *,
                       rng=None, is_training: bool = False,
                       return_all_rounds: bool = False):
        edge_weights, edge_biases = self._stacked(params)
        round_states = []
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
            step_rngs = jax.random.split(round_rng,
                                         batch.msg_targets.shape[1])

            def substep(new_ext, inputs):
                sending, msg_tgt, receiving, step_rng = inputs
                # sending/msg_tgt: [T, SE]; receiving: [RC]
                send_states = new_ext[sending]                  # [T, SE, H]
                msgs = jnp.einsum(
                    "teh,thd->ted", send_states, edge_weights,
                    preferred_element_type=jnp.float32)
                if self.use_edge_bias:
                    msgs = msgs + edge_biases[:, None, :]
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
            if return_all_rounds:
                round_states.append(cur_ext[:n_cap])

        if return_all_rounds:
            return round_states
        return cur_ext[:n_cap]

    def _forward_segmented(self, params: Dict, batch: AsyncGraphBatch, *,
                           rng=None, is_training: bool = False) -> jax.Array:
        """Segmented compact-buffer propagation (the fast path).

        Two measured problems with the uniform layout drive this design
        (QM9-shaped packing, one v5e):
          * per-(round,step,type) lanes run at 3.1% occupancy — the
            per-step-type capacity is the max over a very skewed depth
            profile, so ~97% of the gather/matmul/scatter work was
            padding;
          * each substep scattered its receiver updates into the full
            [N+1, H] node buffer.
        Here every round's states live in a compact slot space (initial
        nodes first, then receivers at cumulative per-step offsets; see
        data/async_schedule.py), the steps are grouped into DP-chosen
        segments whose type-COMBINED send lanes are sized to the steps
        they cover (~13x less padded work), and a substep writes ONE
        contiguous [RC, H] dynamic_update_slice. Aggregation runs as a
        single sorted segment-sum over the composite id target*T + type
        (the lanes are (target, type)-sorted), with a ones-column ride-
        along that yields the per-(receiver, type) counts for the edge
        bias at no extra scatter.
        """
        edge_weights, edge_biases = self._stacked(params)
        n_cap = batch.node_capacity
        h_dim = self.hidden_size
        t_dim = self.num_edge_types
        i_cap = batch.initial_nodes.shape[-1]
        # Per-substep message transform as ONE [RC, T*(H+1)] @
        # [T*(H+1), H] GEMM (the dense path's reassociation): the
        # aggregated [RC, T, H+1] tensor — whose ride-along ones column
        # carries the per-(receiver, type) counts — reshapes
        # CONTIGUOUSLY against an augmented weight whose extra row per
        # type is that type's edge bias, so bias accumulation is part
        # of the same GEMM and no strided [:, :, :H] slice-copy is
        # materialised inside the scan. Built OUTSIDE the scan — see
        # models/dense_ggnn.py on the in-loop-reshape layout trap.
        bias_rows = (edge_biases[:, None, :] if self.use_edge_bias
                     else jnp.zeros((t_dim, 1, h_dim), jnp.float32))
        w_aug = jnp.concatenate([edge_weights, bias_rows],
                                axis=1).reshape(t_dim * (h_dim + 1), h_dim)
        # Remat policy: recompute substeps in the backward only when the
        # saved activations wouldn't fit comfortably — measured: the
        # reference 100k-node budget needs 17.8 GiB without remat
        # (> the chip's 15.75 GiB free), while at the 10-20k-node
        # TPU sweet spot remat COSTS ~1.5-2x step time for nothing
        # (5.42 vs 7.71 ms at 10k; benchmarks/README.md). Config
        # "async_remat" forces either way; unset = auto by estimate.
        remat_cfg = self.config.get("async_remat")
        max_rc = max((seg.old_compact.shape[1]
                      for segs in batch.seg_rounds for seg in segs),
                     default=8)
        m_dump = i_cap + n_cap + max_rc
        if remat_cfg is None:
            # Dominant residuals without remat: the scan carry (the
            # [m_dump+1, H] state buffer) plus the per-substep lane
            # tensors — including the aggregated [RC, T*(H+1)] input of
            # the augmented-weight GEMM, which scales with the number
            # of edge types — saved for EVERY substep of every round.
            # The estimate undercounts XLA's actual residual set ~2-3x
            # (the reference 100k-node budget measures 17.8 GiB live
            # against a ~7 GiB estimate), which the threshold below
            # absorbs: it keeps remat OFF at the 10-20k-node sweet spot
            # (where remat costs ~1.5x step time for nothing) and ON at
            # the reference 100k default.
            saved_floats = sum(
                seg.old_compact.shape[0]
                * ((m_dump + 1) * h_dim
                   + seg.send_compact.shape[1] * (h_dim + 2)
                   + seg.old_compact.shape[1]
                   * (t_dim * (h_dim + 1) + 4 * h_dim))
                for segs in batch.seg_rounds for seg in segs)
            # Threshold: the FIRST-TRACE HBM snapshot (_get_remat_limit
            # samples lazily so smaller-memory devices engage remat
            # earlier while the policy stays deterministic across
            # retraces — see the class comment on why construction-time
            # sampling was rejected).
            use_remat = saved_floats * 4 > self._get_remat_limit()
        else:
            use_remat = bool(remat_cfg)
        feats_ext = jnp.concatenate(
            [batch.node_features, jnp.zeros((1, h_dim))], axis=0)

        prev_buf = feats_ext  # round 0 reads prev states by global id
        for prop_round in range(self.propagation_rounds):
            if rng is not None:
                rng, round_rng = jax.random.split(rng)
            else:
                round_rng = jax.random.PRNGKey(0)  # unused when not training

            buf = jnp.zeros((m_dump + 1, h_dim))
            buf = buf.at[:i_cap].set(prev_buf[batch.init_prev[prop_round]])

            for seg_idx, seg in enumerate(batch.seg_rounds[prop_round]):
                n_steps, rc_cap = seg.old_compact.shape
                step_rngs = jax.random.split(
                    jax.random.fold_in(round_rng, seg_idx), n_steps)

                def substep_inner(buf, inputs, prev_buf=prev_buf,
                                  rc_cap=rc_cap):
                    send_c, mtyp, mtgt, old_idx, base, step_rng = inputs
                    gathered = buf[send_c]                  # [SEA, H]
                    ones = jnp.ones((gathered.shape[0], 1),
                                    gathered.dtype)
                    # composite sorted key: target*T + type; the ones
                    # column rides along to produce per-(rc, t) counts.
                    comp = mtgt * t_dim + mtyp
                    agg = segment_sum(
                        jnp.concatenate([gathered, ones], axis=1),
                        comp, (rc_cap + 1) * t_dim,
                        indices_are_sorted=True)
                    agg = agg.reshape(rc_cap + 1,
                                      t_dim * (h_dim + 1))[:rc_cap]
                    incoming = jnp.matmul(
                        agg, w_aug, preferred_element_type=jnp.float32)
                    old = prev_buf[old_idx]                 # [RC, H]
                    new_h = self.cell_apply(
                        params["cell"], incoming, old,
                        rng=step_rng, is_training=is_training)
                    buf = jax.lax.dynamic_update_slice(
                        buf, new_h, (i_cap + base, 0))
                    return buf, None

                substep = (jax.checkpoint(substep_inner)
                           if use_remat else substep_inner)
                buf, _ = jax.lax.scan(
                    substep, buf,
                    (seg.send_compact, seg.msg_type, seg.msg_target,
                     seg.old_compact, seg.recv_base, step_rngs))
            prev_buf = buf.at[m_dump].set(0.0)

        return prev_buf[batch.final_compact]

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: AsyncGraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        return base.segment_readout(
            heads, task_ids, last_h, batch.node_features,
            batch.node_graph_ids, batch.graph_capacity,
            keep_prob=keep_prob, rng=rng)
