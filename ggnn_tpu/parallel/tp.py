"""Tensor parallelism over the [e, h, h] edge-transform weights.

The sparse GGNN's dominant parameters are the per-layer per-edge-type
transform matrices (`edge_weights` [T, H, H], chem_tensorflow_sparse.py:
88-90) and the per-type attention factors. This module shards their
EDGE-TYPE axis over the mesh's "edge" axis, together with the batch's
per-type edge lanes, giving true tensor parallelism:

  * each shard holds T/P types' weights and transforms only those
    types' messages — T/P of the matmul FLOPs and weights per chip;
  * the partial per-node incoming sums are combined by the model's
    existing `psum` over `edge_axis` (sparse_ggnn.py), and the
    propagation attention's segment softmax already runs its
    max/sum reductions as cross-shard collectives (ops/segment.py);
  * gradient wrt a weight shard is complete locally (only local edges
    touch it) — no gradient sync for sharded leaves, while replicated
    leaves (cells, heads, biases) arrive pre-summed through the psum
    transpose;
  * per-leaf clip-by-norm uses the GLOBAL leaf norm via a psum of
    squared local norms (training/optimizer.py `tp_axis`), matching the
    reference's full-variable `tf.clip_by_norm`.

Selection: config `"edge_parallelism": "type_tp"` (default
"node_shard" — the boundary-exchange layout in parallel/node_shard.py).
Type-TP suits large hidden sizes / many edge types (weight-bound);
node-sharding suits large packed graphs (activation-bound). Both ride
the same mesh axis.
"""

from typing import Dict

import jax
from jax.sharding import PartitionSpec as P

from ggnn_tpu.graph import GraphBatch
from ggnn_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS


def is_tp_sharded_path(path) -> bool:
    """True for param/optimizer leaves sharded over the edge axis:
    the sparse model's per-layer `edge_weights` and `attention` tensors
    (edge biases stay replicated — [T, H] is negligible and keeps the
    bias matmul local).

    Anchored to the GRAPH/LAYERS subtree, not a bare name match: a
    future leaf merely NAMED 'attention' elsewhere (e.g. an attention
    readout head under params['heads']) must not silently inherit
    edge-axis sharding and global-norm psum clipping (round-5 review).
    The Adam moments mirror the param paths with an extra state prefix,
    so 'graph'+'layers' appearing anywhere on the path is the right
    anchor for both trees."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    return ("graph" in keys and "layers" in keys
            and any(k in ("edge_weights", "attention") for k in keys))


def _leaf_spec(path, leaf):
    del leaf
    return P(EDGE_AXIS) if is_tp_sharded_path(path) else P()


def tp_state_specs(state_template) -> Dict:
    """PartitionSpec pytree for {'params', 'opt_state'}: type axis of
    edge_weights/attention over "edge", everything else replicated. The
    Adam moments mirror the param structure, so the same path predicate
    applies to them."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, state_template)


def tp_batch_specs() -> GraphBatch:
    """Stacked GraphBatch specs for type-TP: the step axis over "data",
    the per-type edge lanes' TYPE axis over "edge"; node-indexed arrays
    replicated across TP shards (states are replicated; only the
    transform is sharded). `in_degrees` [N, T] stays replicated — the
    avg-aggregation denominator needs all types."""
    edge_spec = P(DATA_AXIS, EDGE_AXIS)
    return GraphBatch(
        node_features=P(DATA_AXIS),
        node_graph_ids=P(DATA_AXIS),
        edge_sources=edge_spec,
        edge_targets=edge_spec,
        edge_mask=edge_spec,
        in_degrees=P(DATA_AXIS),
        targets=P(DATA_AXIS),
        target_mask=P(DATA_AXIS),
        num_graphs=P(DATA_AXIS),
        num_nodes=P(DATA_AXIS),
    )


def validate_tp(num_edge_types: int, n_tp: int) -> None:
    if num_edge_types % n_tp != 0:
        raise ValueError(
            f"type-TP needs num_edge_types ({num_edge_types}) divisible "
            f"by the edge-axis size ({n_tp})")
