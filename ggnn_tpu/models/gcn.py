"""Sparse GCN (Kipf & Welling) over a pre-normalized packed adjacency.

TPU-native re-design of chem_tensorflow_gcn.py:28-199. The symmetric
normalization D^{-1/2}(A+I)D^{-1/2} happens at preprocess time (numpy,
data/packing.py:graph_to_normalized_adjacency); the model is, per layer l
of `num_timesteps` layers:

    H <- Â · H           weighted gather/segment-sum over the COO list
    H <- H · W_l (+ b_l when gcn_use_bias)
    ReLU + state dropout on all but the last layer

No RNN cell; edge types are discarded by this variant.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from ggnn_tpu.graph import GCNGraphBatch
from ggnn_tpu.models import base
from ggnn_tpu.ops import lanes
from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.ops.segment import segment_sum
from ggnn_tpu.parallel.node_shard import exchange_boundary
from ggnn_tpu.utils.init import glorot_init


class GCN:
    def __init__(self, config: Dict, edge_axis: str = None):
        """`edge_axis` names a mesh axis over which the batch's node/edge
        set is partitioned (node-sharded graph parallelism inside
        `shard_map`, parallel/node_shard.py) — same design as the sparse
        GGNN's: per layer, ONE boundary all_to_all exchanges the cut
        edges' source rows while the local lane's weighted segment-sum
        overlaps with it. `None` = single-shard semantics."""
        self.config = config
        self.edge_axis = edge_axis
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_timesteps"]
        self.use_bias = config["gcn_use_bias"]
        self.state_keep_prob = config["graph_state_dropout_keep_prob"]
        # Packer emits the COO row-major = sorted by target, with dump
        # padding at the end (data/packing.py:505-514) — XLA's sorted
        # scatter path applies.
        self.edges_sorted = bool(config.get("edges_sorted_by_target", True))

    def init_params(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        layers: List[Dict] = []
        for _ in range(self.num_layers):
            key, sub = jax.random.split(key)
            layer = {"W": glorot_init(sub, (h, h))}
            if self.use_bias:
                layer["b"] = jnp.zeros((h,), jnp.float32)
            layers.append(layer)
        return {"layers": layers}

    def forward(self, params: Dict, batch: GCNGraphBatch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        if (rng is None and is_training and self.state_keep_prob < 1.0):
            raise ValueError(
                "state dropout requires an rng key (is_training=True "
                "with graph_state_dropout_keep_prob < 1 and rng=None)")
        if getattr(batch, "send_idx", None) is not None:
            return self._forward_node_sharded(params, batch, rng=rng,
                                              is_training=is_training)
        n_cap = batch.node_capacity
        h = batch.node_features
        for layer_idx, layer in enumerate(params["layers"]):
            # Â @ H: gather source rows, scale by edge weight, segment-sum
            # into targets (the SpMM of gcn.py:69 in gather/scatter form).
            scaled = h[batch.edge_sources] * batch.edge_weights[:, None]
            mixed = segment_sum(scaled, batch.edge_targets, n_cap + 1,
                                indices_are_sorted=self.edges_sorted)[:n_cap]
            new_h = jnp.dot(mixed, layer["W"],
                            preferred_element_type=jnp.float32)
            if self.use_bias:
                new_h = new_h + layer["b"]
            if layer_idx < self.num_layers - 1:
                new_h = jax.nn.relu(new_h)
                if is_training and self.state_keep_prob < 1.0:
                    rng, sub = jax.random.split(rng)
                    new_h = dropout(sub, new_h, self.state_keep_prob)
            h = new_h
        return h

    def _forward_node_sharded(self, params: Dict, batch, *, rng=None,
                              is_training: bool = False) -> jax.Array:
        """Node-sharded Â·H per layer (parallel/node_shard.py GCN
        layout): ONE boundary all_to_all per layer; the local lane's
        weighted gather + sorted partial segment-sum have no data
        dependency on it, so XLA overlaps the exchange with the local
        aggregation; the boundary lane (cut edges only) waits on the
        wire. Identical math to the single-device forward — the two
        partial sums split Σ_j Â[i,j]·H[j] by the source's owner."""
        nl = batch.local_node_capacity
        h = batch.node_features
        h_dim = h.shape[-1]
        for layer_idx, layer in enumerate(params["layers"]):
            recv_flat = exchange_boundary(h, batch.send_idx,
                                          self.edge_axis, h_dim)
            mixed = segment_sum(
                h[batch.loc_src] * batch.loc_w[:, None], batch.loc_tgt,
                nl + 1, indices_are_sorted=self.edges_sorted)
            mixed = mixed + segment_sum(
                recv_flat[batch.bnd_src] * batch.bnd_w[:, None],
                batch.bnd_tgt, nl + 1,
                indices_are_sorted=self.edges_sorted)
            mixed = mixed[:nl]
            new_h = jnp.dot(mixed, layer["W"],
                            preferred_element_type=jnp.float32)
            if self.use_bias:
                new_h = new_h + layer["b"]
            if layer_idx < self.num_layers - 1:
                new_h = jax.nn.relu(new_h)
                if is_training and self.state_keep_prob < 1.0:
                    rng, sub = jax.random.split(rng)
                    new_h = dropout(sub, new_h, self.state_keep_prob)
            h = new_h
        return h

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch: GCNGraphBatch, *, keep_prob: float = 1.0,
                rng=None) -> jax.Array:
        """Gated segment-sum pooling (chem_tensorflow_gcn.py:84-93). For
        node-sharded batches the per-shard pooled sums are partial (a
        graph may span shards), combined with one [G]-sized psum."""
        node_sharded = getattr(batch, "send_idx", None) is not None
        return base.segment_readout(
            heads, task_ids, last_h, batch.node_features,
            batch.node_graph_ids, batch.graph_capacity,
            keep_prob=keep_prob, rng=rng,
            psum_axis=(self.edge_axis
                       if node_sharded and self.edge_axis is not None
                       else None))


class BlockedGCN(GCN):
    """GCN over bucketed dense normalized adjacency (the `gcn_blocked`
    variant — this framework's TPU-first addition, same spirit as the
    `blocked` GGNN variant).

    Identical math to the edge-list GCN above (same pre-normalized
    D^{-1/2}(A+I)D^{-1/2} matrix, chem_tensorflow_gcn.py:116-142), but
    the per-layer Â·H runs as a batched [B,V,V]@[B,V,H] matmul over
    block-diagonal per-graph buckets instead of a weighted
    gather/segment-sum over the packed COO list. Rationale (measured in
    benchmarks/roofline.py): the edge-list GCN step is
    scatter-latency-bound at 1.8% of the MXU rate; for bucketable
    molecular graphs (V <= 32) the dense contraction is MXU food.
    Consumes DenseGraphBatch with adjacency [B, 1, V, V] (single type,
    float normalization weights) from packing.preprocess_gcn_dense.
    """

    def __init__(self, config: Dict):
        super().__init__(config, edge_axis=None)
        self.compute_dtype = jnp.dtype(config.get("compute_dtype",
                                                  "float32"))
        # Lane-padded compute layout (ops/lanes.py): zero-padded H
        # lanes stay zero through relu/linear layers, so the math is
        # unchanged while every GEMM sits on 128-lane tiles.
        self.lane_pad = lanes.resolve_lane_pad(config, self.hidden_size)

    def forward(self, params: Dict, batch, *, rng=None,
                is_training: bool = False) -> jax.Array:
        adj = batch.adjacency[:, 0]          # [B, V, V] (dst, src)
        h = batch.node_features              # [B, V, H]
        d = h.shape[-1]
        pad = (self.lane_pad and d % lanes.LANE != 0
               and not (is_training and self.state_keep_prob < 1.0))
        hp = lanes.round_up_lanes(d) if pad else d
        h = lanes.pad_last(h, hp)
        cdt = self.compute_dtype
        for layer_idx, layer in enumerate(params["layers"]):
            w = lanes.pad_edge_weights_flat(layer["W"], 1, d, hp)
            mixed = jnp.einsum("bvw,bwh->bvh", adj.astype(cdt),
                               h.astype(cdt),
                               preferred_element_type=jnp.float32)
            new_h = jnp.einsum("bvh,hd->bvd", mixed.astype(cdt),
                               w.astype(cdt),
                               preferred_element_type=jnp.float32)
            if self.use_bias:
                new_h = new_h + lanes.pad_last(layer["b"], hp)
            if layer_idx < self.num_layers - 1:
                new_h = jax.nn.relu(new_h)
                if is_training and self.state_keep_prob < 1.0:
                    rng, sub = jax.random.split(rng)
                    new_h = dropout(sub, new_h, self.state_keep_prob)
            h = new_h
        return h[..., :d] if pad else h

    def readout(self, heads: Dict, task_ids, last_h: jax.Array,
                batch, *, keep_prob: float = 1.0, rng=None) -> jax.Array:
        """Gated per-node outputs, masked by node_mask, summed per graph
        (dense-path form of the segment-sum pooling above)."""
        return base.dense_readout(heads, task_ids, last_h,
                                  batch.node_features, batch.node_mask,
                                  keep_prob=keep_prob, rng=rng)
