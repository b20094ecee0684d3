"""Sparse GGNN — the most featureful variant, and the R-GCN host.

TPU-native re-design of chem_tensorflow_sparse.py:36-376. Per layer
(`layer_timesteps` gives the layer count and per-layer step count), each
propagation step does, over the packed super-graph batch:

  1. typed message transform: one batched einsum over all edge types
     (gather [T,E,H] source states, contract with [T,H,H] weights) — a
     single MXU-batched matmul instead of the reference's per-type loop
  2. optional segment-softmax propagation attention
     (chem_tensorflow_sparse.py:170-196)
  3. masked segment-sum aggregation into target nodes
  4. optional edge bias (in-degree counts x [T,H] biases) and optional
     in-degree averaging (default on)
  5. residual concatenation of earlier layers' node states
     (`residual_connections`, default {"2":[0],"4":[0,2]})
  6. RNN cell update (GRU / cuDNN-GRU / basic RNN, tanh or ReLU) with
     TF1.3 gate math and state-dropout wrapper

Edge-weight dropout is applied once per layer per forward pass (the
reference builds one `tf.nn.dropout` op per layer at graph-construction
time, chem_tensorflow_sparse.py:91, so all timesteps of a layer share the
mask within one session step).

The R-GCN of README.md:48-52 is this model with config
`{"use_edge_bias": false, "use_edge_msg_avg_aggregation": true,
"residual_connections": {}, "layer_timesteps": [1]*8,
"graph_rnn_cell": "RNN", "graph_rnn_activation": "ReLU"}`.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from ggnn_tpu.graph import GraphBatch
from ggnn_tpu.models import base
from ggnn_tpu.ops.cells import make_cell
from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.ops.messages import (
    aggregate_messages,
    aggregate_then_transform,
    aggregate_then_transform_combined,
    average_by_in_degree,
    edge_bias_term,
    propagation_attention,
    propagation_attention_weights,
    propagation_attention_weights_combined,
    typed_edge_messages,
)
from ggnn_tpu.ops.segment import segment_softmax, segment_sum
from ggnn_tpu.parallel.node_shard import exchange_boundary
from ggnn_tpu.utils.constants import SMALL_NUMBER
from ggnn_tpu.utils.init import glorot_init


def _validate_residual_connections(residuals: Dict, n_layers: int) -> None:
    """Config-time validation: a residual source must be an EARLIER
    layer state (index 0 = the input annotations, k = layer k-1's
    output; at layer k indices 0..k exist). An out-of-range source used
    to surface as a bare IndexError deep inside forward (round-5 chaos
    sweep); the reference would crash the same way at graph-build time
    (chem_tensorflow_sparse.py:160-167). Layer KEYS beyond the layer
    count stay silently ignored — reference parity: the DEFAULT config
    carries {"2":[0],"4":[0,2]}, and users overriding layer_timesteps
    alone must not suddenly error."""
    for k, lst in residuals.items():
        if k < 0:
            raise ValueError(f"residual_connections layer key {k} < 0")
        if k >= n_layers:
            continue  # reference behavior: unknown layers are ignored
        for i in lst:
            if not 0 <= i <= k:
                raise ValueError(
                    f"residual_connections[{k}] references layer state "
                    f"{i}; valid sources at layer {k} are [0, {k}] "
                    "(earlier layers only)")


class SparseGGNN:
    """Functional model: `init_params(key)` + pure `forward(...)`.

    Static configuration (layer structure, feature flags, capacities) is
    captured in the instance so `forward` closes over python constants and
    traces to a fixed XLA graph.
    """

    def __init__(self, config: Dict, num_edge_types: int,
                 edge_axis: str = None):
        """`edge_axis` names a mesh axis over which the batch's edge set
        is partitioned (graph parallelism inside `shard_map`): message
        aggregation then psums partial per-node sums across edge shards
        over ICI, and propagation attention's segment reductions become
        cross-shard collectives. `None` = single-shard semantics.

        Config extras beyond the reference surface:
          aggregate_first (default True) — aggregate source states per
            (type, target) before the [T,H,H] transform; identical math
            (linearity), ~E/N fewer matmul FLOPs (see
            ops/messages.py:aggregate_then_transform). False keeps the
            reference's per-edge transform order.
          compute_dtype (default "float32") — "bfloat16" runs gathers,
            segment sums and matmuls in bf16 with f32 accumulation
            (MXU-native, halves HBM traffic on the gather/scatter hot
            path); parameters and the loss stay f32.
        """
        self.config = config
        self.num_edge_types = num_edge_types
        self.edge_axis = edge_axis
        self.aggregate_first = bool(config.get("aggregate_first", True))
        self.compute_dtype = jnp.dtype(config.get("compute_dtype", "float32"))
        # NOTE on removed config keys: round 1 shipped opt-in blocked-ELL
        # aggregation paths (`ell_pallas` Pallas MXU kernel,
        # `ell_sorted_vjp` sorted-transpose scatters). Round-2
        # measurements closed the question: the per-edge row access is
        # issue-bound on v5e (~18-21 ns/row even with the gather loop
        # unrolled 8x), so every gather-based formulation — Pallas ELL
        # and XLA sorted scatter alike — sits on the same floor, and the
        # sorted-XLA path (enabled by the packers' target-sorted layout
        # contract, default here) is optimal for edge lists on this
        # hardware. Workloads that can afford block-dense batches should
        # use the `blocked` variant (~5x). The kernel survives as an
        # archived experiment (ops/pallas/ell_spmm.py + tests) but is no
        # longer reachable from the config surface.
        # The packers guarantee per-type target-sorted edge lanes (part
        # of the GraphBatch layout contract); XLA's sorted scatter is
        # ~1.5x faster. Set false for hand-built unsorted batches.
        self.edges_sorted = bool(config.get("edges_sorted_by_target", True))
        # Type-combined edge lane (GraphBatch.edge_*_all): one sorted
        # lane for all types — ~3x less padded gather/scatter work under
        # bond-type skew. Applies to the single-chip GraphBatch path;
        # the node-sharded layout has its own (always-combined) local
        # and boundary lanes, and type-TP keeps typed lanes (the type
        # axis is the sharding axis there).
        self.combined_lanes = bool(config.get("combined_edge_lanes", True))
        self.hidden_size = config["hidden_size"]
        self.layer_timesteps = list(config["layer_timesteps"])
        self.residual_connections = {
            int(k): list(v) for k, v in config["residual_connections"].items()
        }
        _validate_residual_connections(self.residual_connections,
                                       len(self.layer_timesteps))
        self.use_edge_bias = config["use_edge_bias"]
        self.use_propagation_attention = config["use_propagation_attention"]
        self.use_edge_msg_avg_aggregation = config["use_edge_msg_avg_aggregation"]
        self.edge_weight_dropout_keep_prob = config["edge_weight_dropout_keep_prob"]
        self.cell_init, self.cell_apply = make_cell(
            config["graph_rnn_cell"],
            config["graph_rnn_activation"],
            config["graph_state_dropout_keep_prob"],
        )

    def _layer_input_size(self, layer_idx: int) -> int:
        n_res = len(self.residual_connections.get(layer_idx, []))
        return self.hidden_size * (1 + n_res)

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        t = self.num_edge_types
        layers: List[Dict] = []
        for layer_idx in range(len(self.layer_timesteps)):
            key, k_w, k_cell = jax.random.split(key, 3)
            layer: Dict = {
                # Reference draws one glorot [T*H, H] matrix and reshapes
                # (chem_tensorflow_sparse.py:88-90) — fan-in T*H, kept.
                "edge_weights": glorot_init(k_w, (t * h, h)).reshape(t, h, h),
                "cell": self.cell_init(k_cell, self._layer_input_size(layer_idx), h),
            }
            if self.use_propagation_attention:
                layer["attention"] = jnp.ones((t,), jnp.float32)
            if self.use_edge_bias:
                layer["edge_biases"] = jnp.zeros((t, h), jnp.float32)
            layers.append(layer)
        return {"layers": layers}

    def forward(self, params: Dict, batch: GraphBatch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        """Final node representations [N, H] (or [Nl, H] per shard for a
        node-sharded batch)."""
        if getattr(batch, "send_idx", None) is not None:
            return self._forward_node_sharded(params, batch, rng=rng,
                                              is_training=is_training)
        n_cap = batch.node_capacity
        node_states_per_layer = [batch.node_features]

        for layer_idx, num_timesteps in enumerate(self.layer_timesteps):
            layer = params["layers"][layer_idx]
            if rng is not None:
                rng, rng_w = jax.random.split(rng)
                if self.edge_axis is not None:
                    # Type-TP: each shard holds a DISJOINT [T/P, H, H]
                    # weight block — the dropout masks must be
                    # independent per block (a shared key would draw
                    # identical masks for type t and t+T/P). The cell's
                    # state-dropout key stays shared: node states are
                    # replicated across the edge axis.
                    rng_w = jax.random.fold_in(
                        rng_w, jax.lax.axis_index(self.edge_axis))
            else:
                rng_w = None
            edge_weights = layer["edge_weights"]
            if is_training and self.edge_weight_dropout_keep_prob < 1.0:
                edge_weights = dropout(
                    rng_w, edge_weights, self.edge_weight_dropout_keep_prob)

            residual_states = [
                node_states_per_layer[i]
                for i in self.residual_connections.get(layer_idx, [])
            ]

            h = node_states_per_layer[-1]
            cdt = self.compute_dtype
            w_c = edge_weights.astype(cdt)
            use_combined = (self.combined_lanes
                            and getattr(batch, "edge_sources_all", None)
                            is not None
                            and self.edge_axis is None
                            and self.aggregate_first
                            # The combined helpers hardcode the sorted
                            # scatter path; a hand-built UNSORTED batch
                            # (edges_sorted_by_target: false) must
                            # route to the per-type lanes, which honor
                            # the flag (round-5 review).
                            and self.edges_sorted)
            for _step in range(num_timesteps):
                h_c = h.astype(cdt)
                if use_combined:
                    attn = None
                    if self.use_propagation_attention:
                        attn = propagation_attention_weights_combined(
                            h_c, batch.edge_sources_all,
                            batch.edge_targets_all, batch.edge_mask_all,
                            batch.edge_types_all, layer["attention"],
                            n_cap).astype(cdt)
                    incoming = aggregate_then_transform_combined(
                        h_c, batch.edge_sources_all, batch.edge_types_all,
                        batch.edge_targets_all, w_c, n_cap, attn)
                elif self.aggregate_first:
                    attn = None
                    if self.use_propagation_attention:
                        attn = propagation_attention_weights(
                            h_c, batch.edge_sources, batch.edge_targets,
                            batch.edge_mask, layer["attention"], n_cap,
                            edge_axis=self.edge_axis).astype(cdt)
                    incoming = aggregate_then_transform(
                        h_c, batch.edge_sources, batch.edge_targets, w_c,
                        n_cap, attn, targets_sorted=self.edges_sorted)
                else:
                    messages = typed_edge_messages(
                        h_c, batch.edge_sources, w_c)
                    if self.use_propagation_attention:
                        messages = propagation_attention(
                            messages, h_c, batch.edge_sources,
                            batch.edge_targets, batch.edge_mask,
                            layer["attention"], n_cap,
                            edge_axis=self.edge_axis)
                    incoming = aggregate_messages(
                        messages, batch.edge_targets, n_cap)
                incoming = incoming.astype(jnp.float32)
                if self.edge_axis is not None:
                    # Edge-partitioned graph parallelism: each shard summed
                    # only its local edges' messages; combine the partial
                    # per-node sums across shards over ICI.
                    incoming = jax.lax.psum(incoming, self.edge_axis)
                if self.use_edge_bias:
                    incoming = incoming + edge_bias_term(
                        batch.in_degrees, layer["edge_biases"])
                if self.use_edge_msg_avg_aggregation:
                    incoming = average_by_in_degree(incoming, batch.in_degrees)
                incoming_info = jnp.concatenate(
                    residual_states + [incoming], axis=-1)
                if rng is not None:
                    rng, rng_cell = jax.random.split(rng)
                else:
                    rng_cell = None
                h = self.cell_apply(layer["cell"], incoming_info, h,
                                    rng=rng_cell, is_training=is_training)
            node_states_per_layer.append(h)

        return node_states_per_layer[-1]

    def _forward_node_sharded(self, params: Dict, batch, *, rng=None,
                              is_training: bool = False) -> jax.Array:
        """Node-sharded propagation (parallel/node_shard.py layout).

        Per step: gather this shard's boundary rows for every peer
        (`send_idx`) and launch ONE `all_to_all` over the edge mesh
        axis; while it is in flight, aggregate the LOCAL-source lane
        (whose gather + sorted partial segment-sum depend only on this
        shard's own states — XLA's latency-hiding scheduler overlaps it
        with the collective); then aggregate the BOUNDARY-source lane
        against the received table, sum the per-(target, type) partials,
        and finish the step — [T,H,H] transform, bias/avg, cell update —
        entirely locally. Per-step ICI traffic is O(cut-edges·H) instead
        of round 1's O(N·H) full-tensor psum; all segment reductions are
        local because every edge lives on its target's owner shard. Both
        lanes are type-combined and (target, type)-sorted (the packers'
        sorted-scatter contract; see benchmarks/README.md on why the
        combined lane is ~3x the per-type lanes under bond-type skew).

        With propagation attention on, the segment softmax must see
        every incoming edge of a target, so the two lanes' scores are
        softmaxed jointly — the boundary scores need the received rows,
        which serialises the exchange before the softmax (overlap then
        covers only the send gather; attention defaults off).
        """
        nl = batch.local_node_capacity
        h_dim = batch.node_features.shape[-1]
        t_dim = self.num_edge_types
        seg_count = nl * t_dim + 1  # composite target*T+type, pad last
        node_states_per_layer = [batch.node_features]

        for layer_idx, num_timesteps in enumerate(self.layer_timesteps):
            layer = params["layers"][layer_idx]
            if rng is not None:
                rng, rng_w = jax.random.split(rng)
            else:
                rng_w = None
            edge_weights = layer["edge_weights"]
            if is_training and self.edge_weight_dropout_keep_prob < 1.0:
                edge_weights = dropout(
                    rng_w, edge_weights, self.edge_weight_dropout_keep_prob)
            residual_states = [
                node_states_per_layer[i]
                for i in self.residual_connections.get(layer_idx, [])
            ]
            h = node_states_per_layer[-1]
            cdt = self.compute_dtype
            w_c = edge_weights.astype(cdt)
            for _step in range(num_timesteps):
                h_c = h.astype(cdt)
                recv_flat = exchange_boundary(
                    h_c, batch.send_idx, self.edge_axis, h_dim)
                gathered_l = h_c[batch.loc_src]         # [EL, H]
                gathered_b = recv_flat[batch.bnd_src]   # [EB, H]
                if self.use_propagation_attention:
                    # All incoming edges of a target live on this shard
                    # (split across the two lanes), so the segment
                    # softmax is local — but joint over both lanes.
                    tgt_l = h_c[jnp.minimum(batch.loc_tgt, nl - 1)]
                    tgt_b = h_c[jnp.minimum(batch.bnd_tgt, nl - 1)]
                    factors = layer["attention"]
                    scores = jnp.concatenate([
                        jnp.sum((gathered_l * tgt_l).astype(jnp.float32),
                                axis=-1) * factors[batch.loc_type],
                        jnp.sum((gathered_b * tgt_b).astype(jnp.float32),
                                axis=-1) * factors[batch.bnd_type],
                    ])
                    attn = segment_softmax(
                        scores,
                        jnp.concatenate([batch.loc_tgt, batch.bnd_tgt]),
                        nl + 1,
                        jnp.concatenate([batch.loc_mask, batch.bnd_mask]),
                        SMALL_NUMBER)
                    el = batch.loc_src.shape[0]
                    gathered_l = gathered_l * attn[:el, None].astype(cdt)
                    gathered_b = gathered_b * attn[el:, None].astype(cdt)
                per = segment_sum(
                    gathered_l, batch.loc_tgt * t_dim + batch.loc_type,
                    seg_count, indices_are_sorted=self.edges_sorted)
                per = per + segment_sum(
                    gathered_b, batch.bnd_tgt * t_dim + batch.bnd_type,
                    seg_count, indices_are_sorted=self.edges_sorted)
                per = per[:-1].reshape(nl, t_dim, h_dim)
                incoming = jnp.einsum(
                    "nth,thd->nd", per, w_c,
                    preferred_element_type=jnp.float32)
                incoming = incoming.astype(jnp.float32)
                if self.use_edge_bias:
                    incoming = incoming + edge_bias_term(
                        batch.in_degrees, layer["edge_biases"])
                if self.use_edge_msg_avg_aggregation:
                    incoming = average_by_in_degree(incoming,
                                                    batch.in_degrees)
                incoming_info = jnp.concatenate(
                    residual_states + [incoming], axis=-1)
                if rng is not None:
                    rng, rng_cell = jax.random.split(rng)
                else:
                    rng_cell = None
                h = self.cell_apply(layer["cell"], incoming_info, h,
                                    rng=rng_cell, is_training=is_training)
            node_states_per_layer.append(h)
        return node_states_per_layer[-1]

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: GraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        """Per-task graph predictions [K, G] via gated segment-sum pooling
        (chem_tensorflow_sparse.py:220-231). For node-sharded batches the
        per-shard pooled sums are partial (a graph may span shards) and
        are combined with one [G]-sized psum over the edge axis."""
        node_sharded = getattr(batch, "send_idx", None) is not None
        return base.segment_readout(
            heads, task_ids, last_h, batch.node_features,
            batch.node_graph_ids, batch.graph_capacity,
            keep_prob=keep_prob, rng=rng,
            psum_axis=(self.edge_axis
                       if node_sharded and self.edge_axis is not None
                       else None))
