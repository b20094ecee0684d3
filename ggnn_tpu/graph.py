"""Static-shape graph-batch containers (the framework's L1).

The reference feeds ragged numpy arrays through TF1 placeholders
(chem_tensorflow_sparse.py:63-73, chem_tensorflow_dense.py:68-91). On TPU
everything under `jit` must have static shapes, so batches are padded to
fixed capacities and carry explicit masks. Both containers are registered
pytrees, so they pass straight through `jax.jit` / `shard_map` and can be
sharded leaf-wise with `PartitionSpec`s.

Padding conventions (sparse):
  * nodes: rows `[num_nodes, num_nodes_cap)` are zero-features; their
    `node_graph_ids` point at the dump graph slot `num_graphs_cap`, so a
    segment-sum readout with `num_segments = num_graphs_cap + 1` discards
    them by construction (no value-dependent masking needed).
  * edges: padded lanes have `source = 0` (any valid row — their message is
    discarded) and `target = num_nodes_cap` (the dump node slot); segment
    reductions run with `num_segments = num_nodes_cap + 1` and the dump row
    is sliced off. `edge_mask` additionally zeroes padded messages so
    attention scores cannot leak through max-reductions.
  * LAYOUT CONTRACT: each edge type's lane is sorted by target (padding at
    the dump slot N, the largest id, keeps the whole lane sorted). The
    packers guarantee this; the sparse model exploits it via XLA's sorted
    scatter (config `edges_sorted_by_target`, default on). Hand-built
    batches must either sort or disable the flag.
"""

import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A packed multi-graph batch in sparse (typed edge list) form.

    Shapes (T = num edge types, N = node capacity, E = per-type edge
    capacity, G = graph capacity, K = task count, H = feature width):
      node_features  [N, H]   float32 — annotations zero-padded to H
      node_graph_ids [N]      int32   — graph slot per node; padding -> G
      edge_sources   [T, E]   int32   — padding -> 0
      edge_targets   [T, E]   int32   — padding -> N (dump slot)
      edge_mask      [T, E]   float32 — 1.0 for real edges
      in_degrees     [N, T]   float32 — incoming-edge counts per type
      targets        [K, G]   float32
      target_mask    [K, G]   float32
      num_graphs     []       int32   — real graph count (metrics weighting)
      num_nodes      []       int32   — real node count
    """

    node_features: jax.Array
    node_graph_ids: jax.Array
    edge_sources: jax.Array
    edge_targets: jax.Array
    edge_mask: jax.Array
    in_degrees: jax.Array
    targets: jax.Array
    target_mask: jax.Array
    num_graphs: jax.Array
    num_nodes: jax.Array
    # Type-COMBINED edge lane (packers emit it when caps.edges_all > 0):
    # all types' real edges in ONE [EA] lane sorted by (target, type),
    # so the composite segment id target*T + type is monotone and the
    # aggregation scatter runs sorted with ~3x less padding than the
    # per-type lanes (bond-type skew). Pads: tgt -> N, src 0, type 0,
    # mask 0. The per-type lanes above remain the layout for the
    # node-sharded / type-TP mesh paths and the fallback.
    edge_sources_all: jax.Array = None   # [EA] int32
    edge_types_all: jax.Array = None     # [EA] int32
    edge_targets_all: jax.Array = None   # [EA] int32
    edge_mask_all: jax.Array = None      # [EA] float32

    @property
    def num_edge_types(self) -> int:
        return self.edge_sources.shape[0]

    @property
    def node_capacity(self) -> int:
        return self.node_features.shape[0]

    @property
    def graph_capacity(self) -> int:
        return self.targets.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLGraphBatch(GraphBatch):
    """GraphBatch plus blocked-ELL edge layouts for the Pallas SpMM
    kernels (ops/pallas/ell_spmm.py; built by data/ell.py). The edge
    list fields stay valid — XLA fallback paths and the packer's
    invariants are unchanged; the ELL arrays are a redundant layout of
    the same edges keyed by target block (fwd) / source block (bwd).

    Shapes ([T, NB, KE]): NB = padded-node-count / ell-block, KE = max
    edges per (type, node-block) across the corpus plan.
    """

    ell_fwd_src: jax.Array = None
    ell_fwd_tgt: jax.Array = None
    ell_bwd_tgt: jax.Array = None
    ell_bwd_src: jax.Array = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseGraphBatch:
    """A dense-adjacency batch, one graph per row (dense GGNN variant).

    Shapes (B = batch, T = edge types, V = padded vertex count):
      node_features [B, V, H] float32
      adjacency     [B, T, V, V] float32 — adjacency[b, t, dst, src] = 1
      node_mask     [B, V]   float32
      targets       [K, B]   float32
      target_mask   [K, B]   float32
      num_graphs    []       int32
    """

    node_features: jax.Array
    adjacency: jax.Array
    node_mask: jax.Array
    targets: jax.Array
    target_mask: jax.Array
    num_graphs: jax.Array

    @property
    def num_vertices(self) -> int:
        return self.node_features.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AsyncGraphBatch:
    """A packed batch with per-round scheduled-propagation tensors.

    The async GGNN (reference: chem_tensorflow_async.py) propagates along
    a DAG schedule: each round r has `S = propagation_substeps` steps; at
    step s, edges whose receiver sits at schedule depth s fire, and the
    receivers are updated exactly once per round.

    Shapes (R = rounds, S = substeps, T = edge types, I/SE/RC = padded
    capacities for initial nodes, per-(step,type) sending edges and
    per-step receiving nodes):
      initial_nodes   [R, I]        int32 — pad -> N (dump)
      sending_nodes   [R, S, T, SE] int32 — global node ids, pad -> 0
      msg_targets     [R, S, T, SE] int32 — per-step-local receiver ids,
                                            pad -> RC (dump)
      receiving_nodes [R, S, RC]    int32 — global node ids, pad -> N
    """

    node_features: jax.Array   # [N, H]
    node_graph_ids: jax.Array  # [N]
    initial_nodes: jax.Array
    sending_nodes: jax.Array
    msg_targets: jax.Array
    receiving_nodes: jax.Array
    targets: jax.Array         # [K, G]
    target_mask: jax.Array     # [K, G]
    num_graphs: jax.Array
    num_nodes: jax.Array
    # Segmented compact-state layout (data/async_schedule.py): round
    # states live in a compact slot space — [0, I) initial nodes,
    # [I, I + cum-receivers) receivers at cumulative offsets, dump at
    # M = I + N + max-RC — and the steps are grouped into depth-profiled
    # SEGMENTS with type-combined, (target, type)-sorted send lanes
    # sized to each segment (capacities from AsyncCapacities.plan). The
    # fast path scans each segment with its own tight shapes; uniform
    # per-(round,step,type) lanes measured 3.1% occupancy.
    seg_rounds: tuple = None           # tuple(R) of tuple(AsyncSegment)
    init_prev: jax.Array = None        # [R, I] prev-round slots
                                       #   (round 0: global node ids)
    final_compact: jax.Array = None    # [N] last round's slot per node

    @property
    def node_capacity(self) -> int:
        return self.node_features.shape[0]

    @property
    def graph_capacity(self) -> int:
        return self.targets.shape[1]

    @property
    def num_rounds(self) -> int:
        return self.initial_nodes.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AsyncSegment:
    """One scan segment of one async round (n = steps covered).

      send_compact [n, SEA] int32 — compact-slot gather indices of the
          senders, type-combined lane sorted by (target, type);
          padding -> the compact dump row
      msg_type     [n, SEA] int32 — edge type per lane slot, pad -> 0
      msg_target   [n, SEA] int32 — step-local receiver ids, pad -> RC
      old_compact  [n, RC]  int32 — receivers' PREVIOUS-round compact
          slots (round 0: global node ids into the feature buffer)
      recv_base    [n]      int32 — round-cumulative receiver offsets
    """

    send_compact: jax.Array
    msg_type: jax.Array
    msg_target: jax.Array
    old_compact: jax.Array
    recv_base: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GCNGraphBatch:
    """A packed batch for the single-edge-type GCN variant.

    The pre-normalised symmetric adjacency D^{-1/2}(A+I)D^{-1/2} is stored
    as a weighted COO edge list (reference: chem_tensorflow_gcn.py:116-142).
    Padding conventions match `GraphBatch` (target -> N dump slot).
    """

    node_features: jax.Array   # [N, H]
    node_graph_ids: jax.Array  # [N]
    edge_sources: jax.Array    # [E]
    edge_targets: jax.Array    # [E]
    edge_weights: jax.Array    # [E] float32, 0.0 on padding
    targets: jax.Array         # [K, G]
    target_mask: jax.Array     # [K, G]
    num_graphs: jax.Array
    num_nodes: jax.Array

    @property
    def node_capacity(self) -> int:
        return self.node_features.shape[0]

    @property
    def graph_capacity(self) -> int:
        return self.targets.shape[1]
