"""Dense GGNN over bucketed per-edge-type adjacency tensors.

TPU-native re-design of chem_tensorflow_dense.py:52-129. Batches are
dense [B, T, V, V] adjacency stacks (V <= 29 for QM9) — ideal MXU food.
One propagation step (reference math: m_t = h @ W_t (+ b_t);
acts = sum_t A_t @ m_t; here computed in the MXU-friendly
reassociated order — see _forward_reference):

    gathered[b,t,v,:] = A[b,t,v,:] @ h[b]          [B,T*V,V] @ [B,V,H]
    acts[b,v,:] = [gathered[b,:,v,:]] @ W_cat      [B*V,T*H] @ [T*H,H]
    h = GRU(acts (+ indeg_t (x) b_t), h)           shared cell, all steps

The adjacency is oriented A[b, t, dst, src] = 1 (dense.py:30-36), so the
contraction over `w` sums over message *sources*. The GRU cell is shared
across all `num_timesteps` steps (TF scope reuse, dense.py:99-115); edge
weight dropout draws a fresh mask per (timestep, edge-type) like the
reference's per-op dropout inside the unrolled loop (dense.py:104).

EXTENDED MODE (this framework's TPU-first addition): when the config
carries sparse-style keys (`layer_timesteps` present), the dense path
exposes the FULL sparse-GGNN feature surface — per-layer weights and
RNN cells (GRU / cuDNN-GRU / RNN, tanh or ReLU), residual connections,
propagation attention, per-type edge bias and in-degree averaging
(chem_tensorflow_sparse.py:63-218 semantics) — computed entirely with
dense masked tensor ops. Rationale: on TPU the block-diagonal dense
formulation of a packed molecular batch runs ~10x faster per graph than
edge-list scatter/gather (bench.py; the MXU eats the padded [V,V]
contraction, and there is no scatter), so small-graph workloads get the
featureful model at dense-path speed while the sparse edge-list path
remains for graphs too large to bucket.

Known parity limit (round-5 review; REFERENCE-faithful on both sides):
self-loops and duplicate edges diverge between the dense and sparse
representations — the dense adjacency dedupes by assignment
(amat[t,dst,src]=1, exactly chem_tensorflow_dense.py:30-36) while the
sparse packer keeps duplicates (a tied self-loop is appended twice,
chem_tensorflow_sparse.py:258-263), so such a graph gets different
message counts / in-degrees under `blocked` vs `sparse`. Molecular
data has neither; cross-variant agreement tests cover the shared
domain.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from ggnn_tpu.graph import DenseGraphBatch
from ggnn_tpu.models import base
from ggnn_tpu.ops import lanes
from ggnn_tpu.ops.cells import make_cell
from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.utils.constants import SMALL_NUMBER
from ggnn_tpu.utils.init import glorot_init


class DenseGGNN:
    def __init__(self, config: Dict, num_edge_types: int):
        self.config = config
        self.num_edge_types = num_edge_types
        self.hidden_size = config["hidden_size"]
        self.use_edge_bias = config["use_edge_bias"]
        self.edge_weight_dropout_keep_prob = config["edge_weight_dropout_keep_prob"]
        # "bfloat16" runs the propagation matmuls on the MXU in bf16
        # with f32 accumulation (same policy as the sparse model).
        self.compute_dtype = jnp.dtype(config.get("compute_dtype", "float32"))
        # Lane-padded compute layout (ops/lanes.py): H=100 activations
        # and weights are zero-padded to 128 lanes INSIDE forward so
        # every GEMM/reshape sits on the (8,128) f32 tile grid; params
        # stay at the reference shapes. Numerics-preserving (pad lanes
        # provably stay 0), so TF1 goldens pass unchanged.
        self.lane_pad = lanes.resolve_lane_pad(config, self.hidden_size)
        self.state_keep_prob = config["graph_state_dropout_keep_prob"]
        self.extended = "layer_timesteps" in config
        if self.extended:
            self.layer_timesteps = list(config["layer_timesteps"])
            self.residual_connections = {
                int(k): list(v)
                for k, v in config.get("residual_connections", {}).items()
            }
            from ggnn_tpu.models.sparse_ggnn import (
                _validate_residual_connections)
            _validate_residual_connections(self.residual_connections,
                                           len(self.layer_timesteps))
            self.use_propagation_attention = config.get(
                "use_propagation_attention", False)
            self.use_edge_msg_avg_aggregation = config.get(
                "use_edge_msg_avg_aggregation", False)
            self.cell_init, self.cell_apply = make_cell(
                config.get("graph_rnn_cell", "GRU"),
                config.get("graph_rnn_activation", "tanh"),
                config["graph_state_dropout_keep_prob"])
        else:
            self.num_timesteps = config["num_timesteps"]
            # Reference dense variant hard-codes a tanh GRU
            # (tf.contrib.rnn.GRUCell, dense.py:88) in state dropout.
            self.cell_init, self.cell_apply = make_cell(
                "gru", "tanh", config["graph_state_dropout_keep_prob"])

    # ----------------------------------------------------------- params

    def _layer_input_size(self, layer_idx: int) -> int:
        n_res = len(self.residual_connections.get(layer_idx, []))
        return self.hidden_size * (1 + n_res)

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        t = self.num_edge_types
        if not self.extended:
            k_w, k_cell = jax.random.split(key)
            params = {
                "edge_weights": glorot_init(k_w, (t, h, h)),
                "cell": self.cell_init(k_cell, h, h),
            }
            if self.use_edge_bias:
                params["edge_biases"] = jnp.zeros((t, 1, h), jnp.float32)
            return params
        layers: List[Dict] = []
        for layer_idx in range(len(self.layer_timesteps)):
            key, k_w, k_cell = jax.random.split(key, 3)
            layer: Dict = {
                # Same init layout as the sparse variant (fan-in T*H).
                "edge_weights": glorot_init(k_w, (t * h, h)).reshape(t, h, h),
                "cell": self.cell_init(k_cell, self._layer_input_size(layer_idx), h),
            }
            if self.use_propagation_attention:
                layer["attention"] = jnp.ones((t,), jnp.float32)
            if self.use_edge_bias:
                layer["edge_biases"] = jnp.zeros((t, h), jnp.float32)
            layers.append(layer)
        return {"layers": layers}

    # ---------------------------------------------------------- forward

    def forward(self, params: Dict, batch: DenseGraphBatch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        if (rng is None and is_training
                and (self.edge_weight_dropout_keep_prob < 1.0
                     or self.state_keep_prob < 1.0)):
            # Clear error at the call site, not jax.random.split(None)'s
            # opaque TypeError deep in the step loop (round-5 review;
            # same contract as ops/cells.py and ops/mlp.py).
            raise ValueError(
                "dropout requires an rng key (is_training=True with "
                "edge_weight/state keep_prob < 1 and rng=None)")
        if self.extended:
            return self._forward_extended(params, batch, rng=rng,
                                          is_training=is_training)
        return self._forward_reference(params, batch, rng=rng,
                                       is_training=is_training)

    def _forward_reference(self, params, batch, *, rng, is_training):
        """Final node representations [B, V, H] (dense.py:93-117).

        The propagation is computed in the reassociated form

            acts = sum_t (A_t @ h) @ W_t

        — one [B, T*V, V] @ [B, V, H] batched matmul plus ONE large
        [B*V, T*H] @ [T*H, H] GEMM over the packed type axis — rather
        than the reference's sum_t A_t @ (h @ W_t), whose second
        contraction is a batched tiny-K matmul the MXU tiles poorly.
        Measured +11% train throughput on a v5e at identical FLOPs
        (benchmarks/README.md, "dense reassociation"). Algebraically
        identical; f32 rounding differs ~1e-6, inside the TF1-golden
        tolerances. The edge bias A_t @ (m + b_t) contributes
        indeg_t (x) b_t, a forward-constant hoisted out of the loop.
        """
        h = batch.node_features  # [B, V, H]
        adjacency = batch.adjacency
        b, t, v, _ = adjacency.shape
        d = h.shape[-1]
        cdt = self.compute_dtype
        # Lane padding: run the loop at hp=128 compute lanes (zero pad
        # lanes stay zero through the GRU — ops/lanes.py). Disabled
        # when state dropout is live so its mask draw keeps the
        # unpadded RNG shape/stream.
        pad = (self.lane_pad and d % lanes.LANE != 0
               and not (is_training and self.state_keep_prob < 1.0))
        hp = lanes.round_up_lanes(d) if pad else d
        cell_params = params["cell"]
        if pad:
            h = lanes.pad_last(h, hp)
            cell_params = lanes.pad_cell_params(params["cell"], d, hp)
        # Transposed to (v, t) row order ONCE, outside the loop, so the
        # gathered states reshape straight to [B, V, T*H] with no
        # per-step transpose.
        a2 = adjacency.astype(cdt).transpose(0, 2, 1, 3).reshape(
            b, v * t, v)
        bias = None
        if self.use_edge_bias:
            indeg_t = jnp.sum(adjacency, axis=3)  # [B, T, V]
            bias = jnp.einsum("btv,th->bvh", indeg_t,
                              lanes.pad_last(params["edge_biases"][:, 0, :],
                                             hp),
                              preferred_element_type=jnp.float32)
        # The [T,H,H]->[T*H,H] reshape must be hoisted OUT of the loop
        # — ALSO on the dropout path: reshaping inside makes the
        # backward accumulate the weight cotangent in [T,H,H] per
        # step, which flips XLA:TPU's layout choice for `gathered` and
        # inserts 8 bf16 layout copies (~10% of the train step;
        # benchmarks/README.md "dense reassociation"). Drawing dropout
        # on the flat view is numerics-identical: jax PRNG bits are
        # generated in flat element order, so the mask matches the
        # [T,H,H] draw bit-for-bit (pinned in test_models.py).
        w_flat = params["edge_weights"].reshape(t * d, d)
        dropout_active = (is_training
                          and self.edge_weight_dropout_keep_prob < 1.0)
        if not dropout_active:
            w_cat = lanes.pad_edge_weights_flat(w_flat, t, d, hp).astype(cdt)
        for _step in range(self.num_timesteps):
            if dropout_active:
                # Mask drawn at the UNPADDED shape (stream-identical to
                # the unpadded path), then zero-padded to compute lanes.
                rng, rng_w = jax.random.split(rng)
                w_cat = lanes.pad_edge_weights_flat(
                    dropout(rng_w, w_flat,
                            self.edge_weight_dropout_keep_prob),
                    t, d, hp).astype(cdt)
            gathered = jnp.matmul(a2, h.astype(cdt),
                                  preferred_element_type=jnp.float32)
            acts = jnp.matmul(gathered.reshape(b, v, t * hp).astype(cdt),
                              w_cat,
                              preferred_element_type=jnp.float32)
            if bias is not None:
                acts = acts + bias
            if rng is not None:
                rng, rng_cell = jax.random.split(rng)
            else:
                rng_cell = None
            h = self.cell_apply(
                cell_params, acts.reshape(b * v, hp), h.reshape(b * v, hp),
                rng=rng_cell, is_training=is_training).reshape(b, v, hp)
        return h[..., :d] if pad else h

    def _dense_attention(self, h, adjacency, type_factors):
        """Dense analog of the sparse segment-softmax attention
        (chem_tensorflow_sparse.py:170-196): per target vertex v, the
        softmax runs jointly over every incoming (type, source) pair
        with an adjacency entry, max-shifted under stop_gradient and
        epsilon-stabilised exactly like ops/segment.py."""
        b, t, v, _ = adjacency.shape
        scores = jnp.einsum("bvh,bwh->bvw", h, h,
                            preferred_element_type=jnp.float32)
        scores = scores[:, None] * type_factors[None, :, None, None]
        mask = adjacency > 0                               # [B,T,V,W]
        neg_inf = jnp.finfo(scores.dtype).min
        masked = jnp.where(mask, scores, neg_inf)
        flat = masked.transpose(0, 2, 1, 3).reshape(b, v, t * v)
        s_max = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(flat, axis=-1, keepdims=True), neg_inf / 2))
        exped = jnp.exp(flat - s_max) * flat_mask_cast(mask, b, v, t)
        denom = jnp.sum(exped, axis=-1, keepdims=True) + SMALL_NUMBER
        attn = (exped / denom).reshape(b, v, t, v).transpose(0, 2, 1, 3)
        return attn                                         # [B,T,V,W]

    def _forward_extended(self, params, batch, *, rng, is_training):
        adjacency = batch.adjacency                          # [B,T,V,W]
        b, t, v, _ = adjacency.shape
        d = self.hidden_size
        # Lane padding (see _forward_reference). Pad lanes stay zero
        # through every supported cell; attention scores are dot
        # products over h, where pad lanes contribute exact zeros.
        pad = (self.lane_pad and d % lanes.LANE != 0
               and not (is_training and self.state_keep_prob < 1.0))
        hp = lanes.round_up_lanes(d) if pad else d
        indeg_t = jnp.sum(adjacency, axis=3)                 # [B,T,V]
        in_deg = jnp.sum(indeg_t, axis=1)                    # [B,V]
        node_states_per_layer = [lanes.pad_last(batch.node_features, hp)]

        for layer_idx, num_timesteps in enumerate(self.layer_timesteps):
            layer = params["layers"][layer_idx]
            if rng is not None:
                rng, rng_w = jax.random.split(rng)
            else:
                rng_w = None
            edge_weights = layer["edge_weights"]
            if is_training and self.edge_weight_dropout_keep_prob < 1.0:
                # Drawn at the unpadded shape; padded below.
                edge_weights = dropout(
                    rng_w, edge_weights, self.edge_weight_dropout_keep_prob)
            cell_params = (lanes.pad_cell_params(layer["cell"], d, hp)
                           if pad else layer["cell"])
            residual_states = [
                node_states_per_layer[i]
                for i in self.residual_connections.get(layer_idx, [])
            ]

            h = node_states_per_layer[-1]
            cdt = self.compute_dtype
            w_cat = lanes.pad_edge_weights_flat(
                edge_weights.reshape(t * d, d), t, d, hp)
            # Reassociated sum_t (a_t @ h) @ W_t — see
            # _forward_reference; valid for ANY per-edge weighting a
            # (attention included), not just 0/1 adjacency. Without
            # attention the (v, t)-ordered transpose hoists out of the
            # timestep loop.
            a2_const = None
            if not self.use_propagation_attention:
                a2_const = adjacency.astype(cdt).transpose(
                    0, 2, 1, 3).reshape(b, v * t, v)
            for _step in range(num_timesteps):
                if self.use_propagation_attention:
                    a = adjacency * self._dense_attention(
                        h, adjacency, layer["attention"])
                    a2 = a.astype(cdt).transpose(0, 2, 1, 3).reshape(
                        b, v * t, v)
                else:
                    a2 = a2_const
                gathered = jnp.matmul(a2, h.astype(cdt),
                                      preferred_element_type=jnp.float32)
                incoming = jnp.matmul(
                    gathered.reshape(b, v, t * hp).astype(cdt),
                    w_cat.astype(cdt),
                    preferred_element_type=jnp.float32)
                if self.use_edge_bias:
                    # sum_t indeg_t[v] * bias_t — identical to the
                    # sparse num_incoming_edges_per_type @ edge_biases.
                    incoming = incoming + jnp.einsum(
                        "btv,th->bvh", indeg_t,
                        lanes.pad_last(layer["edge_biases"], hp),
                        preferred_element_type=jnp.float32)
                if self.use_edge_msg_avg_aggregation:
                    incoming = incoming / (in_deg[..., None] + SMALL_NUMBER)
                incoming_info = jnp.concatenate(
                    residual_states + [incoming], axis=-1)
                if rng is not None:
                    rng, rng_cell = jax.random.split(rng)
                else:
                    rng_cell = None
                width = incoming_info.shape[-1]
                h = self.cell_apply(
                    cell_params, incoming_info.reshape(b * v, width),
                    h.reshape(b * v, hp), rng=rng_cell,
                    is_training=is_training).reshape(b, v, hp)
            node_states_per_layer.append(h)
        last = node_states_per_layer[-1]
        return last[..., :d] if pad else last

    # ---------------------------------------------------------- readout

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: DenseGraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        """Per-task graph predictions [K, B]: gated node outputs, masked by
        node_mask, summed per graph (dense.py:119-129)."""
        return base.dense_readout(heads, task_ids, last_h,
                                  batch.node_features, batch.node_mask,
                                  keep_prob=keep_prob, rng=rng)


def flat_mask_cast(mask, b, v, t):
    """[B,T,V,W] bool adjacency mask -> [B,V,T*W] float in softmax order."""
    return mask.transpose(0, 2, 1, 3).reshape(b, v, t * mask.shape[3]
                                              ).astype(jnp.float32)
