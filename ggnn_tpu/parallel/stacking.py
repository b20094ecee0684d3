"""Host-side batch stacking + sharding specs for the (data, edge) mesh.

The single-chip pipeline yields `GraphBatch` pytrees one at a time. For
multi-chip training, `n_data * steps_per_update` of them are stacked
along a new leading axis; shard_map splits that axis over the "data"
mesh axis and the per-type edge-capacity axis over the "edge" mesh axis.
Ragged epochs are topped up with explicit empty batches (all-masked, so
their loss/gradient contribution is exactly zero) rather than repeating
data — replicating the reference's graph-weighted metric accounting
(chem_tensorflow.py:229-247) under a fixed step shape.
"""

from typing import List

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from ggnn_tpu.graph import DenseGraphBatch, GraphBatch
from ggnn_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS


def repad_edges(batch: GraphBatch, edge_capacity: int) -> GraphBatch:
    """Grow the per-type edge capacity to `edge_capacity` (e.g. to a
    multiple of the edge-mesh size). Padding follows the GraphBatch
    dump-slot convention: source 0, target `node_capacity`, mask 0."""
    t, e = batch.edge_sources.shape
    if edge_capacity < e:
        raise ValueError(f"cannot shrink edge capacity {e} -> {edge_capacity}")
    if edge_capacity == e:
        return batch
    pad = edge_capacity - e
    # dataclasses.replace keeps the batch's exact type and any extra
    # leaves (combined *_all lanes — unaffected by per-type capacity —
    # and ELL arrays, which encode real edges only): constructing a
    # plain GraphBatch here used to silently drop them, making padded
    # and unpadded batches pytree-incompatible for stacking.
    import dataclasses
    return dataclasses.replace(
        batch,
        edge_sources=np.concatenate(
            [batch.edge_sources, np.zeros((t, pad), np.int32)], axis=1),
        edge_targets=np.concatenate(
            [batch.edge_targets,
             np.full((t, pad), batch.node_capacity, np.int32)], axis=1),
        edge_mask=np.concatenate(
            [batch.edge_mask, np.zeros((t, pad), np.float32)], axis=1),
    )


def empty_batch_like(batch: GraphBatch) -> GraphBatch:
    """An all-padding batch with the same capacities: zero graphs, zero
    masked targets — a no-op under the masked loss and metrics."""
    import dataclasses
    n_cap = batch.node_capacity
    g_cap = batch.graph_capacity
    t, e = batch.edge_sources.shape
    k = batch.targets.shape[0]
    h = batch.node_features.shape[1]
    extra = {}
    if getattr(batch, "edge_sources_all", None) is not None:
        # Combined-lane padding conventions (graph.py): filler batches
        # must carry the same leaves or stacking with real batches
        # fails on pytree structure.
        ea = batch.edge_sources_all.shape[0]
        extra = {
            "edge_sources_all": np.zeros((ea,), np.int32),
            "edge_types_all": np.zeros((ea,), np.int32),
            "edge_targets_all": np.full((ea,), n_cap, np.int32),
            "edge_mask_all": np.zeros((ea,), np.float32),
        }
    return dataclasses.replace(
        batch,
        node_features=np.zeros((n_cap, h), np.float32),
        node_graph_ids=np.full((n_cap,), g_cap, np.int32),
        edge_sources=np.zeros((t, e), np.int32),
        edge_targets=np.full((t, e), n_cap, np.int32),
        edge_mask=np.zeros((t, e), np.float32),
        in_degrees=np.zeros((n_cap, t), np.float32),
        targets=np.zeros((k, g_cap), np.float32),
        target_mask=np.zeros((k, g_cap), np.float32),
        num_graphs=np.int32(0),
        num_nodes=np.int32(0),
        **extra,
    )


def _strip_combined(b: GraphBatch) -> GraphBatch:
    """Drop the type-combined edge lane (the typed-lane mesh layouts —
    type-TP — partition the per-type lanes instead)."""
    import dataclasses
    if getattr(b, "edge_sources_all", None) is None:
        return b
    return dataclasses.replace(b, edge_sources_all=None,
                               edge_types_all=None, edge_targets_all=None,
                               edge_mask_all=None)


def stack_batches(batches: List[GraphBatch], n_data: int,
                  n_edge: int = 1, edge_capacity: int = None,
                  keep_combined: bool = False) -> GraphBatch:
    """Stack per-step batches into one leading-axis pytree whose leading
    dim is a multiple of `n_data`. Short stacks are topped up with
    empty batches.

    `edge_capacity` pins the repadded per-type capacity — REQUIRED for
    multi-process assembly, where each host stacks a different subset
    of the group and a locally-derived max() could diverge across hosts
    (different compiled shapes -> collective deadlock; round-5 review).

    `keep_combined=True` retains the type-combined edge lane (the ~3x
    aggregation layout) — correct for pure data-parallel meshes, where
    the model runs the same single-chip math per shard. Typed-lane mesh
    layouts (type-TP) leave it False. (`n_edge` no longer rounds the
    edge capacity: the only n_edge>1 consumer is type-TP, which shards
    the TYPE axis, not the capacity axis — the old rounding padded the
    wrong axis.)"""
    if not batches:
        raise ValueError("no batches to stack")
    if not (keep_combined
            and all(getattr(b, "edge_sources_all", None) is not None
                    for b in batches)):
        batches = [_strip_combined(b) for b in batches]
    e_cap = (edge_capacity if edge_capacity is not None
             else max(b.edge_sources.shape[1] for b in batches))
    batches = [repad_edges(b, e_cap) for b in batches]
    if len(batches) % n_data != 0:
        filler = empty_batch_like(batches[0])
        batches = batches + [filler] * (n_data - len(batches) % n_data)
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def empty_dense_batch_like(batch: DenseGraphBatch) -> DenseGraphBatch:
    """All-masked dense batch (loss/gradient no-op filler)."""
    return DenseGraphBatch(
        node_features=np.zeros_like(np.asarray(batch.node_features)),
        adjacency=np.zeros_like(np.asarray(batch.adjacency)),
        node_mask=np.zeros_like(np.asarray(batch.node_mask)),
        targets=np.zeros_like(np.asarray(batch.targets)),
        target_mask=np.zeros_like(np.asarray(batch.target_mask)),
        num_graphs=np.int32(0),
    )


def stack_dense_batches(batches: List[DenseGraphBatch],
                        n_data: int) -> DenseGraphBatch:
    """Stack same-shape dense batches (single-bucket packing — set
    `dense_bucket_sizes` to one entry for mesh runs) along a leading
    axis that is a multiple of `n_data`; short stacks get empty
    fillers."""
    if not batches:
        raise ValueError("no batches to stack")
    shapes = {np.asarray(b.node_features).shape for b in batches}
    if len(shapes) != 1:
        raise ValueError(
            f"mesh dense stacking needs one bucket shape, got {shapes}; "
            "set dense_bucket_sizes to a single entry")
    if len(batches) % n_data != 0:
        filler = empty_dense_batch_like(batches[0])
        batches = batches + [filler] * (n_data - len(batches) % n_data)
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def stacked_dense_batch_specs() -> DenseGraphBatch:
    """Every leaf splits its leading (step) axis over "data"."""
    return DenseGraphBatch(
        node_features=P(DATA_AXIS), adjacency=P(DATA_AXIS),
        node_mask=P(DATA_AXIS), targets=P(DATA_AXIS),
        target_mask=P(DATA_AXIS), num_graphs=P(DATA_AXIS),
    )


def data_parallel_specs(template_batch):
    """P("data") on every leaf of any batch pytree — the generic
    data-parallel layout for fixed-shape batch types (GCN, async)."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), template_batch)


def stack_any_batches(batches: List, n_data: int, empty_fn=None):
    """Stack same-shape batch pytrees along a new leading axis that is a
    multiple of `n_data`; short stacks get `empty_fn(batches[0])`
    fillers (required when the count isn't divisible)."""
    if not batches:
        raise ValueError("no batches to stack")
    if len(batches) % n_data != 0:
        if empty_fn is None:
            raise ValueError(
                f"{len(batches)} batches not divisible by n_data={n_data} "
                "and no empty_fn provided")
        filler = empty_fn(batches[0])
        batches = batches + [filler] * (n_data - len(batches) % n_data)
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def stack_from_process_local(local_stack, mesh, specs):
    """Assemble a GLOBAL stacked batch from per-process data-axis
    slices (the production multi-host input path, SURVEY §5.8).

    Under `jax.distributed`, each process packs only ITS portion of the
    corpus (the contiguous data-axis slice its devices own on `mesh`)
    and passes the resulting local stack here; every leaf becomes a
    global `jax.Array` via `jax.make_array_from_process_local_data`, so
    no host ever materialises (or ships) another host's batches. The
    static capacities (PackCapacities / NodeShardCaps) must be agreed
    globally beforehand — plan them from a deterministic metadata pass
    over the full corpus, exactly like the Runner's dry pack.

    `specs` is the same PartitionSpec pytree the parallel step was built
    with (stacked_batch_specs / sharded_batch_specs / ...). Leaves whose
    spec does not shard axis 0 over "data" are replicated and must be
    identical across processes (targets on node-sharded layouts, etc.).

    On a single process this is equivalent to `jax.device_put(stack,
    NamedSharding(mesh, spec))` per leaf.
    """
    from jax.sharding import NamedSharding

    def make(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree_util.tree_map(make, local_stack, specs)


def empty_masked_batch_like(batch):
    """Generic all-masked filler: zero targets/masks/counters, other
    leaves copied (their compute contributes nothing through the masked
    loss). Works for GCN/async batch types whose padding conventions
    keep arbitrary index leaves valid."""
    import dataclasses
    return dataclasses.replace(
        batch,
        targets=np.zeros_like(np.asarray(batch.targets)),
        target_mask=np.zeros_like(np.asarray(batch.target_mask)),
        num_graphs=np.int32(0),
    )


def stacked_batch_specs(n_edge: int = 1,
                        combined: bool = False) -> GraphBatch:
    """PartitionSpecs for a stacked GraphBatch: every leaf splits its
    leading (step) axis over "data". The edge axis is left out of the
    specs entirely — every n_edge>1 layout has its own spec builder
    (node_shard / tp), so this spec set is data-parallel only, and
    naming an unused axis would make vma inference flag every output
    as possibly edge-varying. `combined=True` matches stacks built
    with `stack_batches(keep_combined=True)` (the DP mesh path keeps
    the ~3x combined aggregation lane — round-5 review: stripping it
    on DP meshes forfeited the single-chip layout win)."""
    del n_edge  # kept for call-site compatibility; see docstring
    kwargs = {}
    if combined:
        kwargs = {"edge_sources_all": P(DATA_AXIS),
                  "edge_types_all": P(DATA_AXIS),
                  "edge_targets_all": P(DATA_AXIS),
                  "edge_mask_all": P(DATA_AXIS)}
    return GraphBatch(
        node_features=P(DATA_AXIS),
        node_graph_ids=P(DATA_AXIS),
        edge_sources=P(DATA_AXIS),
        edge_targets=P(DATA_AXIS),
        edge_mask=P(DATA_AXIS),
        in_degrees=P(DATA_AXIS),
        targets=P(DATA_AXIS),
        target_mask=P(DATA_AXIS),
        num_graphs=P(DATA_AXIS),
        num_nodes=P(DATA_AXIS),
        **kwargs,
    )
