"""Node-sharded edge partitioning with boundary exchange (SURVEY §5.7).

The graph analog of sequence/context parallelism. Round 1 replicated the
node arrays on every edge shard and all-reduced the full [N, H] incoming
tensor once per propagation step — correct, but O(N·H) ICI traffic per
step regardless of how the graphs are cut. This module implements the
north-star design:

  * the packed super-graph's NODES are partitioned into contiguous
    ranges, one per shard on the mesh's "edge" axis (graphs are packed
    contiguously, so a contiguous range cut touches at most S-1 graphs
    of a molecular batch — near-zero cut edges — while a deliberately
    split giant graph gets a proportional cut);
  * each EDGE lives on the shard that owns its TARGET node, so segment
    aggregation — including the segment-softmax propagation attention
    (chem_tensorflow_sparse.py:170-196) — is shard-local, with no
    cross-shard collective at all;
  * per propagation step, each shard sends exactly the boundary source
    rows its neighbours' edges reference (`send_idx`) through ONE
    `all_to_all` over ICI: per-step communication drops from O(N·H) to
    O(cut-edges·H);
  * per-graph readout pooling produces partial sums (a graph may span
    shards) combined by a single [G]-sized psum per batch.

Autodiff needs no manual gradient communication: the `all_to_all`
transposes to the reverse `all_to_all`, and the boundary gather
transposes to a scatter-add into the owning shard's rows
(tests/test_parallel.py pins gradient parity against the single-device
oracle).

Index space of `edge_sources` (per shard): `[0, Nl)` local rows,
`[Nl, Nl + S*B)` boundary rows in (owner, slot) order, `Nl + S*B` an
all-zero row for padded lanes. `edge_targets` stay in local space with
dump slot `Nl`.
"""

import dataclasses
from typing import Iterable, List

import numpy as np

import jax

from ggnn_tpu.graph import GraphBatch
from ggnn_tpu.utils.padding import round_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NodeShardedGraphBatch:
    """A GraphBatch re-laid-out for S node shards.

    Leaves marked [S, ...] carry a leading shard axis that shard_map
    splits over the "edge" mesh axis; the rest are replicated.

      node_features  [S, Nl, H]
      node_graph_ids [S, Nl]        padding -> G (dump graph)
      in_degrees     [S, Nl, T]
      edge_sources   [S, T, El]     combined-table index space (see above)
      edge_targets   [S, T, El]     local target rows, padding -> Nl
      edge_mask      [S, T, El]
      send_idx       [S, S, B]      rows THIS shard sends to each dest
      targets        [K, G]         replicated
      target_mask    [K, G]         replicated
      num_graphs     []             replicated
      num_nodes      []             replicated
    """

    node_features: jax.Array
    node_graph_ids: jax.Array
    in_degrees: jax.Array
    edge_sources: jax.Array
    edge_targets: jax.Array
    edge_mask: jax.Array
    send_idx: jax.Array
    targets: jax.Array
    target_mask: jax.Array
    num_graphs: jax.Array
    num_nodes: jax.Array

    # Fields whose axis 0 is the shard axis (split over the edge mesh
    # axis by shard_map; squeezed to a per-shard view by local_view).
    SHARDED_FIELDS = ("node_features", "node_graph_ids", "in_degrees",
                      "edge_sources", "edge_targets", "edge_mask",
                      "send_idx")

    @property
    def graph_capacity(self) -> int:
        return self.targets.shape[1]

    @property
    def local_node_capacity(self) -> int:
        return self.node_features.shape[-2]

    def local_view(self) -> "NodeShardedGraphBatch":
        """Inside shard_map each sharded leaf has local shard extent 1;
        squeeze it so the model sees plain per-shard arrays."""
        updates = {f: getattr(self, f)[0] for f in self.SHARDED_FIELDS}
        return dataclasses.replace(self, **updates)


@dataclasses.dataclass(frozen=True)
class NodeShardCaps:
    """Static capacities for one compiled node-sharded program."""
    n_shards: int
    nodes_local: int      # Nl
    edges_per_type: int   # El (per shard per type)
    boundary: int         # B (per ordered shard pair)


def _shard_ranges(node_capacity: int, n_shards: int) -> int:
    """Local node capacity: contiguous ranges of ceil(N/S) rows."""
    return -(-node_capacity // n_shards)


def plan_node_shard_caps(batches: Iterable[GraphBatch], n_shards: int,
                         margin: float = 1.3) -> NodeShardCaps:
    """Walk (dry-pack) batches and size El and B for the epoch, with a
    shuffle margin (same policy as the packers' capacity planning)."""
    max_el, max_b, nl = 1, 0, 8
    for batch in batches:
        nl = _shard_ranges(batch.node_capacity, n_shards)
        src = np.asarray(batch.edge_sources)
        tgt = np.asarray(batch.edge_targets)
        mask = np.asarray(batch.edge_mask) > 0
        t_dim = src.shape[0]
        for t in range(t_dim):
            s, d = src[t][mask[t]], tgt[t][mask[t]]
            if not len(s):
                continue
            owner_d = d // nl
            max_el = max(max_el, int(np.bincount(
                owner_d, minlength=n_shards).max()))
            cut = s // nl != owner_d
            if np.any(cut):
                # unique (owner, dest, src-row) triples per pair
                pairs = np.stack([s[cut] // nl, owner_d[cut], s[cut]], 1)
                uniq = np.unique(pairs, axis=0)
                pair_ids = uniq[:, 0] * n_shards + uniq[:, 1]
                max_b = max(max_b, int(np.bincount(
                    pair_ids, minlength=n_shards * n_shards).max()))
    return NodeShardCaps(
        n_shards=n_shards,
        nodes_local=nl,
        edges_per_type=round_up(int(np.ceil(max_el * margin)), 8),
        boundary=max(8, round_up(int(np.ceil(max_b * margin)), 8)),
    )


def shard_batch(batch: GraphBatch, caps: NodeShardCaps
                ) -> NodeShardedGraphBatch:
    """Re-lay one packed GraphBatch into S node shards (host, numpy)."""
    s_count = caps.n_shards
    nl, el, b_cap = caps.nodes_local, caps.edges_per_type, caps.boundary
    n_cap = batch.node_capacity
    g_cap = batch.graph_capacity
    feats = np.asarray(batch.node_features)
    gids = np.asarray(batch.node_graph_ids)
    degs = np.asarray(batch.in_degrees)
    src = np.asarray(batch.edge_sources)
    tgt = np.asarray(batch.edge_targets)
    mask = np.asarray(batch.edge_mask)
    t_dim, h_dim = src.shape[0], feats.shape[1]

    # ---- local node arrays (contiguous ranges, zero/dump padded)
    nf = np.zeros((s_count, nl, h_dim), feats.dtype)
    ng = np.full((s_count, nl), g_cap, gids.dtype)
    nd = np.zeros((s_count, nl, t_dim), degs.dtype)
    for s in range(s_count):
        lo, hi = s * nl, min((s + 1) * nl, n_cap)
        if hi > lo:
            nf[s, :hi - lo] = feats[lo:hi]
            ng[s, :hi - lo] = gids[lo:hi]
            nd[s, :hi - lo] = degs[lo:hi]

    # ---- boundary send lists: send_idx[owner, dest] = local rows
    send_idx = np.zeros((s_count, s_count, b_cap), np.int32)
    slot_of = {}  # (owner, dest, local_row) -> slot
    fill = np.zeros((s_count, s_count), np.int64)
    real = mask > 0
    owners_s, owners_d = src // nl, np.where(real, tgt // nl, 0)
    for t in range(t_dim):
        for o, d, j in zip(owners_s[t][real[t]], owners_d[t][real[t]],
                           (src[t] % nl)[real[t]]):
            if o == d:
                continue
            key = (int(o), int(d), int(j))
            if key not in slot_of:
                k = int(fill[o, d])
                if k >= b_cap:
                    raise ValueError(
                        f"boundary capacity overflow: pair ({o}->{d}) "
                        f"needs more than {b_cap} rows")
                slot_of[key] = k
                send_idx[o, d, k] = j
                fill[o, d] = k + 1

    # ---- per-shard per-type edge lanes (combined-index sources)
    zero_row = nl + s_count * b_cap
    es = np.full((s_count, t_dim, el), zero_row, np.int32)
    et = np.full((s_count, t_dim, el), nl, np.int32)
    em = np.zeros((s_count, t_dim, el), np.float32)
    for s in range(s_count):
        for t in range(t_dim):
            sel = real[t] & (owners_d[t] == s)
            e_src, e_tgt = src[t][sel], tgt[t][sel]
            if len(e_src) > el:
                raise ValueError(
                    f"per-shard edge capacity overflow: shard {s} type "
                    f"{t} holds {len(e_src)} > {el} edges")
            local_tgt = (e_tgt % nl).astype(np.int32)
            o = e_src // nl
            j = e_src % nl
            comb = np.where(
                o == s, j,
                nl + o * b_cap + np.array(
                    [slot_of.get((int(oo), s, int(jj)), 0)
                     for oo, jj in zip(o, j)], np.int64),
            ).astype(np.int32)
            order = np.argsort(local_tgt, kind="stable")
            k = len(order)
            es[s, t, :k] = comb[order]
            et[s, t, :k] = local_tgt[order]
            em[s, t, :k] = 1.0
    return NodeShardedGraphBatch(
        node_features=nf, node_graph_ids=ng, in_degrees=nd,
        edge_sources=es, edge_targets=et, edge_mask=em,
        send_idx=send_idx,
        targets=np.asarray(batch.targets),
        target_mask=np.asarray(batch.target_mask),
        num_graphs=np.asarray(batch.num_graphs),
        num_nodes=np.asarray(batch.num_nodes),
    )


def empty_sharded_batch_like(b: NodeShardedGraphBatch
                             ) -> NodeShardedGraphBatch:
    """All-padding filler (loss/gradient no-op under the masked loss)."""
    nl = b.local_node_capacity
    return NodeShardedGraphBatch(
        node_features=np.zeros_like(np.asarray(b.node_features)),
        node_graph_ids=np.full_like(np.asarray(b.node_graph_ids),
                                    b.graph_capacity),
        in_degrees=np.zeros_like(np.asarray(b.in_degrees)),
        edge_sources=np.full_like(np.asarray(b.edge_sources),
                                  nl + b.send_idx.shape[1]
                                  * b.send_idx.shape[2]),
        edge_targets=np.full_like(np.asarray(b.edge_targets), nl),
        edge_mask=np.zeros_like(np.asarray(b.edge_mask)),
        send_idx=np.zeros_like(np.asarray(b.send_idx)),
        targets=np.zeros_like(np.asarray(b.targets)),
        target_mask=np.zeros_like(np.asarray(b.target_mask)),
        num_graphs=np.int32(0),
        num_nodes=np.int32(0),
    )


def shard_and_stack(batches: List[GraphBatch], caps: NodeShardCaps,
                    n_data: int) -> NodeShardedGraphBatch:
    """shard_batch each + stack along a new leading step axis padded to
    a multiple of n_data with empty fillers."""
    sharded = [shard_batch(b, caps) for b in batches]
    if len(sharded) % n_data != 0:
        filler = empty_sharded_batch_like(sharded[0])
        sharded += [filler] * (n_data - len(sharded) % n_data)
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *sharded)


def sharded_batch_specs(n_edge: int):
    """PartitionSpecs for a stacked NodeShardedGraphBatch: leading step
    axis over "data", shard axis over "edge" (replicated leaves: data
    only)."""
    from jax.sharding import PartitionSpec as P
    from ggnn_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS
    sharded = P(DATA_AXIS, EDGE_AXIS)
    return NodeShardedGraphBatch(
        node_features=sharded, node_graph_ids=sharded, in_degrees=sharded,
        edge_sources=sharded, edge_targets=sharded, edge_mask=sharded,
        send_idx=sharded,
        targets=P(DATA_AXIS), target_mask=P(DATA_AXIS),
        num_graphs=P(DATA_AXIS), num_nodes=P(DATA_AXIS),
    )
