"""Inference serving: checkpoint -> precompiled batched predictor.

The reference's only inference path is `example_evaluation`
(chem_tensorflow_sparse.py:364-376, chem_tensorflow_dense.py:230-265):
rebuild the whole training graph, feed ten molecules, print. For
deployment this module provides a standalone `Predictor` covering EVERY
variant (sparse / rgcn / dense / blocked / gcn / async):

  * loads a checkpoint WITHOUT any training data — this framework's
    pickles/Orbax dirs AND reference-produced TF1 pickles (converted via
    ggnn_tpu.compat.tf1) both work; model geometry (edge types, hidden
    size) is inferred from the saved weights;
  * compiles ONE forward executable per packed shape: sparse/gcn/async
    requests share a fixed serving envelope (`max_nodes`/`max_graphs`),
    dense-family requests compile once per bucket shape (the bucket
    table is the envelope);
  * packs incoming graph JSON with the native pipeline where available
    and micro-batches requests that exceed the envelope.

Example:
    predictor = Predictor.from_checkpoint("run_model_best.pickle",
                                          variant="sparse")
    mu = predictor(molecule_jsons)      # np.ndarray [K, n_graphs]
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

from ggnn_tpu.data import async_schedule, native_pack, packing
from ggnn_tpu.data.loader import DatasetMeta
from ggnn_tpu.models.base import init_output_heads
from ggnn_tpu.training.checkpoint import (_load_payload, _looks_tf1,
                                           restore_checkpoint)
from ggnn_tpu.training.variants import _use_native, make_adapter

_DENSE_FAMILY = ("dense", "blocked", "gcn_blocked")


def _infer_geometry(payload: Dict, variant: str, config: Dict):
    """(num_edge_types, hidden) from saved weights, any checkpoint
    format. Hidden comes from config; T from the edge-weight tensor."""
    weights = payload["weights"]
    hidden = int(config["hidden_size"])
    if variant in ("gcn", "gcn_blocked"):
        return 1, hidden

    def probe(*names):
        for n in names:
            if n in weights:
                return np.asarray(weights[n])
        return None

    if variant in ("sparse", "rgcn"):
        w = probe("['params']['graph']['layers'][0]['edge_weights']",
                  "params.graph.layers.0.edge_weights")
        if w is not None:
            return int(w.shape[0]), hidden
        w = probe("graph_model/gnn_layer_0/gnn_edge_weights_0",
                  "graph_model/gnn_layer_0/gnn_edge_weights_0:0")
        if w is not None:
            return int(w.shape[0]) // hidden, hidden
    elif variant in _DENSE_FAMILY:
        w = probe("['params']['graph']['edge_weights']",
                  "params.graph.edge_weights",
                  "['params']['graph']['layers'][0]['edge_weights']",
                  "params.graph.layers.0.edge_weights",
                  "graph_model/Variable", "graph_model/Variable:0")
        if w is not None:
            return int(w.shape[0]), hidden
    elif variant == "async":
        # Per-type leaves (models/async_ggnn.py stores a LIST of [H, H]
        # weights so per-leaf clip == the reference's per-variable clip).
        if any(k.startswith("['params']['graph']['edge_weights'][")
               or k.startswith("params.graph.edge_weights.")
               for k in weights):
            t = sum(1 for k in weights
                    if k.startswith("['params']['graph']['edge_weights'][")
                    or k.startswith("params.graph.edge_weights."))
            return t, hidden
        # legacy stacked [T, H, H] checkpoints
        w = probe("['params']['graph']['edge_weights']",
                  "params.graph.edge_weights")
        if w is not None:
            return int(w.shape[0]), hidden
        # reference TF1 pickles: per-type variables
        t = sum(1 for k in weights if k.split(":")[0].startswith(
            "graph_model/gnn_edge_weights_typ"))
        if t:
            return t, hidden
    raise ValueError(
        f"cannot infer geometry for variant '{variant}' from checkpoint "
        f"keys {sorted(weights)[:6]}...")


class Predictor:
    """Precompiled forward pass over a fixed serving envelope."""

    def __init__(self, variant: str, config: Dict, meta: DatasetMeta,
                 state: Dict, max_nodes: int = 2048,
                 max_graphs: int = 256):
        self.variant = variant
        self.config = dict(config)
        self.meta = meta
        self.task_ids = list(config["task_ids"])
        self.max_nodes = max_nodes
        self.max_graphs = max_graphs
        kwargs = {"drop_remainder": False} if variant in _DENSE_FAMILY else {}
        self.adapter = make_adapter(variant, self.config, meta, **kwargs)
        self.params = state["params"]
        import collections
        import threading
        self._async_sched_cache = collections.OrderedDict()
        self._async_sched_cache_bytes = 0
        self._async_batch_cache = collections.OrderedDict()
        self._async_batch_cache_bytes = 0
        # Guards the two LRU caches above: the bundled PredictionServer
        # already serializes whole calls, but a Predictor shared across
        # threads directly must not race move_to_end/popitem or corrupt
        # the byte counter (round-4 advisor finding). Schedule/packing
        # work runs OUTSIDE the lock; only cache bookkeeping holds it.
        self._cache_lock = threading.Lock()
        if variant in ("sparse", "rgcn", "gcn"):
            self.caps = packing.PackCapacities(
                nodes=max_nodes,
                edges_per_type=max(8 * max_nodes, 64),
                graphs=max_graphs,
                # type-combined lane envelope (~4 bonds/node x 2
                # directions covers molecular graphs with headroom)
                edges_all=max(8 * max_nodes, 64),
            )
            self.adapter.caps = self.caps
        elif variant == "async":
            self.caps = async_schedule.AsyncCapacities(
                nodes=max_nodes, graphs=max_graphs,
                initial_nodes=max_nodes,
                sending_edges=max(8 * max_nodes, 64),
                receiving_nodes=max_nodes,
            )
            self.adapter.caps = self.caps

        self._build_forward()

    def _build_forward(self):
        """Compile the live model. `ggnn_tpu.export.ExportedPredictor`
        overrides this to dispatch to pinned StableHLO functions
        instead — everything else (packing, micro-batching, envelope
        checks) is shared."""
        self.model = self.adapter.build_model()

        def forward(params, batch):
            final = self.model.forward(params["graph"], batch)
            return self.model.readout(params["heads"], self.task_ids,
                                      final, batch)

        self._forward = jax.jit(forward)

    # ------------------------------------------------------------ load

    @classmethod
    def from_checkpoint(cls, path: str, variant: str = "sparse",
                        max_nodes: int = 2048, max_graphs: int = 256,
                        annotation_size: Optional[int] = None,
                        config_overrides: Optional[Dict] = None
                        ) -> "Predictor":
        """`config_overrides` merge over the checkpoint's embedded
        config for the SERVING surface (bucket tables, native_pack,
        compute_dtype, ...). They do not participate in the restore
        compat check and must not change weight geometry (hidden_size /
        layer structure — the restored leaves keep their shapes)."""
        payload = _load_payload(path)
        config = dict(payload["params"])
        if _looks_tf1(payload):
            # TF1 reference pickle: tolerate a partial saved config by
            # filling this variant's defaults underneath it.
            from ggnn_tpu.training.config import default_params_for
            config = {**default_params_for(variant), **config}
        num_edge_types, hidden = _infer_geometry(payload, variant, config)
        meta = DatasetMeta(max_num_vertices=max_nodes,
                           num_edge_types=num_edge_types,
                           annotation_size=annotation_size or hidden)
        # Build a fresh state skeleton then restore into it (reuses the
        # partial-restore machinery, config compat check, and the TF1
        # reference-pickle conversion).
        import jax.random as jrandom
        kwargs = {"drop_remainder": False} if variant in _DENSE_FAMILY else {}
        adapter = make_adapter(variant, config, meta, **kwargs)
        model = adapter.build_model()
        k = jrandom.PRNGKey(0)
        skeleton = {
            "params": {
                "graph": model.init_params(k),
                "heads": init_output_heads(k, config["hidden_size"],
                                           config["task_ids"]),
            },
        }
        # Optimizer state in the checkpoint is ignored for serving: the
        # restore warns about the unused opt_state entries.
        restored, _, _ = restore_checkpoint(
            path, config, skeleton, log=lambda *a: None,
            variant=variant, num_edge_types=num_edge_types,
            payload=payload)
        if config_overrides:
            config = {**config, **config_overrides}
        return cls(variant, config, meta, restored,
                   max_nodes=max_nodes, max_graphs=max_graphs)

    # ----------------------------------------------------------- batches

    def _batches(self, raw_graphs: Sequence, annotation_size: int):
        cfg = self.config
        if self.variant in _DENSE_FAMILY:
            # Before touching self.caps — dense predictors have none,
            # and the AttributeError would mask this guidance.
            raise ValueError(
                f"_batches does not serve variant '{self.variant}' "
                "(dense family routes through _call_dense)")
        # The packers' fit check is strict (`offset + n < budget`,
        # reference semantics), so budget = envelope + 1 lets a request
        # graph of exactly max_nodes through — the arrays are sized by
        # caps.nodes either way.
        node_budget = self.caps.nodes + 1
        if self.variant in ("sparse", "rgcn"):
            if _use_native(cfg):
                processed = native_pack.preprocess_sparse_native(
                    raw_graphs, self.meta.num_edge_types,
                    cfg["tie_fwd_bkwd"], self.task_ids, {}, False)
                return native_pack.pack_sparse_batches_native(
                    processed, self.meta.num_edge_types, cfg["tie_fwd_bkwd"],
                    node_budget, self.caps, cfg["hidden_size"],
                    annotation_size, False, None)
            processed = packing.preprocess_sparse(
                raw_graphs, self.meta.num_edge_types, cfg["tie_fwd_bkwd"],
                self.task_ids, {}, False)
            return packing.pack_sparse_batches(
                processed, self.meta.num_edge_types, node_budget,
                self.caps, cfg["hidden_size"], annotation_size, False, None)
        if self.variant == "gcn":
            if _use_native(cfg):
                processed = native_pack.preprocess_gcn_native(
                    raw_graphs, self.task_ids, {}, False)
                return native_pack.pack_gcn_batches_native(
                    processed, node_budget, self.caps, cfg["hidden_size"],
                    annotation_size, False, None)
            processed = packing.preprocess_gcn(raw_graphs, self.task_ids,
                                               {}, False)
            return packing.pack_gcn_batches(
                processed, node_budget, self.caps, cfg["hidden_size"],
                annotation_size, False, None)
        if self.variant == "async":
            # Schedule compilation (graph_to_propagation_schedules +
            # table flattening) depends only on the TOPOLOGY and the
            # propagation config — cache it per topology so a repeat
            # request (the serving steady state: the same molecules
            # re-scored under new conditions) skips the DAG levelling
            # entirely and pays only the batch scatter-assembly.
            processed = [self._async_processed(g) for g in raw_graphs]
            return async_schedule.pack_async_batches(
                processed, self.meta.num_edge_types, node_budget,
                self.caps, cfg["propagation_rounds"],
                cfg["propagation_substeps"], cfg["hidden_size"],
                annotation_size, False, None)
        raise ValueError(
            f"_batches does not serve variant '{self.variant}' "
            "(dense family routes through _call_dense)")

    # ------------------------------------------------------------- call

    def __call__(self, raw_graphs: Sequence) -> np.ndarray:
        """Predict per-task values for raw graph JSON dicts.

        Returns [K, len(raw_graphs)]. Requests larger than the serving
        envelope are transparently micro-batched; dense-family requests
        are re-ordered internally by bucket, and the result is scattered
        back to request order.
        """
        if not raw_graphs:
            raise ValueError("empty prediction request")
        first = raw_graphs[0].get("node_features") or []
        if not first:
            raise ValueError(
                "graph 0: node_features must be non-empty with a "
                "consistent width across the request")
        annotation_size = len(first[0])
        for i, g in enumerate(raw_graphs):
            if (not g.get("node_features")
                    or len(g["node_features"][0]) != annotation_size):
                raise ValueError(
                    f"graph {i}: node_features must be non-empty with a "
                    f"consistent width ({annotation_size}) across the "
                    "request")
            # Vertex-id range check at the ENTRY for every variant and
            # packing path (round-5 review): the native sparse kernel
            # rejects out-of-range ids (rc -5), but the python multi-
            # graph paths and the async schedule compiler did not — an
            # id past this graph's node count would silently gather/
            # scatter ANOTHER request graph's rows in a packed batch
            # (and the async per-topology cache would then pin the
            # poisoned batch).
            n = len(g["node_features"])
            edges = np.asarray(g.get("graph", ()),
                               np.int64).reshape(-1, 3)
            if edges.size and (edges[:, [0, 2]].min() < 0
                               or edges[:, [0, 2]].max() >= n):
                raise ValueError(
                    f"graph {i}: edge vertex id out of range [0, {n})")
        if self.variant in _DENSE_FAMILY:
            return self._call_dense(raw_graphs, annotation_size)
        if len(raw_graphs) == 1 and self.variant in ("sparse", "rgcn"):
            batch = self._pack_single_sparse(raw_graphs[0], annotation_size)
            computed = self._forward(self.params, jax.device_put(batch))
            return np.asarray(computed)[:, :1]
        if len(raw_graphs) == 1 and self.variant == "async":
            batch = self._pack_single_async(raw_graphs[0], annotation_size)
            computed = self._forward(self.params, jax.device_put(batch))
            return np.asarray(computed)[:, :1]
        outs: List[np.ndarray] = []
        for batch in self._batches(raw_graphs, annotation_size):
            computed = self._forward(self.params, jax.device_put(batch))
            outs.append(np.asarray(computed)[:, :int(batch.num_graphs)])
        return np.concatenate(outs, axis=1)

    def _pack_single_sparse_native(self, g: Dict, edges: np.ndarray,
                                   n: int, annotation_size: int):
        """C fast path for _pack_single_sparse (native/packer.cpp
        pack_single_sparse): one call fills every array. Returns None
        when the native library is unavailable or the envelope exceeds
        the kernel's 21-bit id fields (the numpy path takes over)."""
        from ggnn_tpu.graph import GraphBatch
        from ggnn_tpu.native import get_lib

        if not _use_native(self.config):
            # "native_pack": false is the documented escape hatch for a
            # suspect native build; the batch-of-one latency path must
            # honor it like every multi-graph path does (round-5
            # review — it used to call the C kernel regardless).
            return None
        lib = get_lib()
        if lib is None:
            return None
        caps = self.caps
        t_dim = self.meta.num_edge_types
        hidden = self.config["hidden_size"]
        ea = int(caps.edges_all or 0)
        edge_sources = np.empty((t_dim, caps.edges_per_type), np.int32)
        edge_targets = np.empty_like(edge_sources)
        edge_mask = np.empty((t_dim, caps.edges_per_type), np.float32)
        comb_src = np.empty(max(ea, 1), np.int32)
        comb_typ = np.empty_like(comb_src)
        comb_tgt = np.empty_like(comb_src)
        comb_mask = np.empty(max(ea, 1), np.float32)
        in_degrees = np.empty((caps.nodes, t_dim), np.float32)
        node_features = np.empty((caps.nodes, hidden), np.float32)
        node_graph_ids = np.empty(caps.nodes, np.int32)
        feats = np.ascontiguousarray(g["node_features"], dtype=np.float32)
        edges_c = np.ascontiguousarray(edges)
        rc = lib.pack_single_sparse(
            edges_c.ctypes.data, len(edges), feats.ctypes.data, n,
            annotation_size, t_dim, int(self.config["tie_fwd_bkwd"]),
            caps.nodes, caps.edges_per_type, ea, hidden, caps.graphs,
            edge_sources.ctypes.data, edge_targets.ctypes.data,
            edge_mask.ctypes.data,
            comb_src.ctypes.data, comb_typ.ctypes.data,
            comb_tgt.ctypes.data, comb_mask.ctypes.data,
            in_degrees.ctypes.data, node_features.ctypes.data,
            node_graph_ids.ctypes.data)
        if rc == -4:
            return None  # ids exceed the kernel's key fields
        if rc == -3:
            num_fwd = t_dim if self.config["tie_fwd_bkwd"] else t_dim // 2
            raise ValueError(
                f"edge type out of range [1, {num_fwd}] in request graph")
        if rc == -5:
            raise ValueError(
                f"edge vertex id out of range [0, {n}) in request graph")
        if rc == -6:
            raise ValueError(
                f"request feature width {annotation_size} exceeds the "
                f"model hidden size {hidden}")
        if rc != 0:
            raise ValueError(
                f"graph with {2 * len(edges)} directed edges exceeds "
                f"pack capacities {self.caps}")
        targets, target_mask = self._single_graph_targets(g, caps.graphs)
        extra = {}
        if ea:
            extra = dict(edge_sources_all=comb_src, edge_types_all=comb_typ,
                         edge_targets_all=comb_tgt, edge_mask_all=comb_mask)
        return GraphBatch(
            node_features=node_features, node_graph_ids=node_graph_ids,
            edge_sources=edge_sources, edge_targets=edge_targets,
            edge_mask=edge_mask, in_degrees=in_degrees,
            targets=targets, target_mask=target_mask,
            num_graphs=np.int32(1), num_nodes=np.int32(n), **extra)

    def _pack_single_sparse(self, g: Dict, annotation_size: int):
        """Vectorized one-graph fast pack (the latency-critical serving
        path): same GraphBatch, BIT-identical to `_batches` on a
        1-graph request (tests/test_serving.py pins it leaf-for-leaf),
        assembled with numpy array ops instead of the per-graph python/
        native corpus pipeline — measured ~6x cheaper host-side
        (benchmarks/latency.py). Semantics mirrored from
        data/packing.py: 0-based types with tied/untied backward edges
        (graph_to_adjacency_lists), per-type lanes (target, source)-
        sorted with dump-slot padding, the type-combined
        (target, type)-sorted lane, per-type in-degrees, and the
        labels->values/mask convention."""
        from ggnn_tpu.graph import GraphBatch

        caps = self.caps
        t_dim = self.meta.num_edge_types
        tie = self.config["tie_fwd_bkwd"]
        num_fwd = t_dim if tie else t_dim // 2
        hidden = self.config["hidden_size"]
        n = len(g["node_features"])
        if n >= caps.nodes + 1:
            raise ValueError(
                f"graph with {n} nodes exceeds pack capacities {caps}")

        edges = np.asarray(g.get("graph", ()), dtype=np.int32).reshape(-1, 3)
        native = self._pack_single_sparse_native(g, edges, n,
                                                 annotation_size)
        if native is not None:
            return native
        raw_t = edges[:, 1]
        if raw_t.size and not (1 <= raw_t.min() and raw_t.max() <= num_fwd):
            bad = raw_t[(raw_t < 1) | (raw_t > num_fwd)][0]
            raise ValueError(f"edge type {bad} out of range [1, {num_fwd}]")
        ends = edges[:, (0, 2)]
        if ends.size and not (0 <= ends.min() and ends.max() < n):
            raise ValueError(
                f"edge vertex id out of range [0, {n}) in request graph")
        src = np.concatenate([edges[:, 0], edges[:, 2]])
        dst = np.concatenate([edges[:, 2], edges[:, 0]])
        typ = np.concatenate([raw_t - 1,
                              raw_t - 1 if tie else raw_t - 1 + num_fwd])
        if caps.edges_all and len(src) > caps.edges_all:
            raise ValueError(
                f"graph with {len(src)} directed edges exceeds the "
                f"combined-lane capacity in {caps}")

        node_features = np.zeros((caps.nodes, hidden), np.float32)
        node_features[:n, :annotation_size] = g["node_features"]
        node_graph_ids = np.full(caps.nodes, caps.graphs, np.int32)
        node_graph_ids[:n] = 0
        in_degrees = np.zeros((caps.nodes, t_dim), np.float32)
        np.add.at(in_degrees, (dst, typ), 1.0)

        e_cap = caps.edges_per_type
        edge_sources = np.zeros((t_dim, e_cap), np.int32)
        edge_targets = np.full((t_dim, e_cap), caps.nodes, np.int32)
        edge_mask = np.zeros((t_dim, e_cap), np.float32)
        # One (type, target, source) sort yields every per-type lane in
        # its packed order; per-type slots are positions within type.
        order = np.lexsort((src, dst, typ))
        s_s, d_s, t_s = src[order], dst[order], typ[order]
        counts = np.bincount(t_s, minlength=t_dim)
        if np.any(counts > e_cap):
            raise ValueError(
                f"graph with {counts.max()} edges of one type exceeds "
                f"pack capacities {caps}")
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slots = np.arange(len(t_s)) - starts[t_s]
        edge_sources[t_s, slots] = s_s
        edge_targets[t_s, slots] = d_s
        edge_mask[t_s, slots] = 1.0

        targets, target_mask = self._single_graph_targets(g, caps.graphs)

        common = dict(
            node_features=node_features,
            node_graph_ids=node_graph_ids,
            edge_sources=edge_sources,
            edge_targets=edge_targets,
            edge_mask=edge_mask,
            in_degrees=in_degrees,
            targets=targets,
            target_mask=target_mask,
            num_graphs=np.int32(1),
            num_nodes=np.int32(n),
        )
        if caps.edges_all:
            # (target, type)-sorted combined lane; ties keep source
            # order, matching build_combined_lane's stable lexsort over
            # the (target, source)-sorted per-type lanes.
            order2 = np.lexsort((s_s, t_s, d_s))
            ea = caps.edges_all
            out_src = np.zeros(ea, np.int32)
            out_tgt = np.full(ea, caps.nodes, np.int32)
            out_typ = np.zeros(ea, np.int32)
            out_mask = np.zeros(ea, np.float32)
            m = len(order2)
            out_src[:m] = s_s[order2]
            out_tgt[:m] = d_s[order2]
            out_typ[:m] = t_s[order2]
            out_mask[:m] = 1.0
            common.update(edge_sources_all=out_src, edge_types_all=out_typ,
                          edge_targets_all=out_tgt, edge_mask_all=out_mask)
        return GraphBatch(**common)

    _ASYNC_SCHED_CACHE_CAP = 2048
    _ASYNC_SCHED_CACHE_BYTES = 256 * 2**20

    @staticmethod
    def _flat_nbytes(flat) -> int:
        """Host bytes of one cached _FlatSchedules (dataclass whose
        fields are numpy arrays or tuples of them)."""
        import dataclasses as _dc
        total = 0
        for f in _dc.fields(flat):
            field = getattr(flat, f.name)
            for arr in (field if isinstance(field, tuple) else (field,)):
                total += getattr(arr, "nbytes", 0)
        return total

    def _async_processed(self, g: Dict) -> Dict:
        """Processed entry for one async request graph, with the
        topology-keyed schedule cache (LRU, bounded). The cached value
        is exactly preprocess_async's `flat_schedules` (data/
        async_schedule.py:391-410); `init`/`labels` are per-request."""
        cfg = self.config
        n = len(g["node_features"])
        cache = self._async_sched_cache
        key = self._topology_key(g)
        with self._cache_lock:
            hit = cache.get(key)
            if hit is not None:
                cache.move_to_end(key)
        flat = hit[0] if hit is not None else None
        if flat is None:
            schedules = async_schedule.graph_to_propagation_schedules(
                g.get("graph", ()), self.meta.num_edge_types,
                cfg["tie_fwd_bkwd"],
                cfg["propagation_rounds"], cfg["propagation_substeps"],
                num_nodes=n)
            flat = async_schedule._flatten_schedules(
                schedules, cfg["propagation_substeps"],
                self.meta.num_edge_types)
            nbytes = self._flat_nbytes(flat)
            with self._cache_lock:
                if key not in cache:
                    cache[key] = (flat, nbytes)
                    self._async_sched_cache_bytes += nbytes
                    # Entry-capped AND byte-bounded (round-5 review —
                    # the batch cache was byte-bounded for exactly this
                    # risk: envelope-sized schedules are ~MBs each and
                    # 2048 of them would pin gigabytes of host RAM).
                    while (len(cache) > self._ASYNC_SCHED_CACHE_CAP
                           or self._async_sched_cache_bytes
                           > self._ASYNC_SCHED_CACHE_BYTES):
                        _, (_, old_b) = cache.popitem(last=False)
                        self._async_sched_cache_bytes -= old_b
        from ggnn_tpu.data.packing import _extract_labels
        labels = (_extract_labels(g, self.task_ids) if "targets" in g
                  else [None] * len(self.task_ids))
        return {
            "init": np.asarray(g["node_features"], dtype=np.float32),
            "flat_schedules": flat,
            "labels": labels,
        }

    _ASYNC_BATCH_CACHE_CAP = 256
    _ASYNC_BATCH_CACHE_BYTES = 256 * 2**20

    @staticmethod
    def _topology_key(g: Dict):
        """Canonical topology identity for the async caches — ONE
        recipe (n, edge-bytes) shared by the schedule and packed-batch
        caches so their keying can never drift."""
        edges = np.asarray(g.get("graph", ()), np.int64).reshape(-1, 3)
        return len(g["node_features"]), edges.tobytes()

    def _single_graph_targets(self, g: Dict, graph_cap: int):
        """The packers' single-graph targets convention, shared by
        every batch-of-one fast path: labels->values/mask on an
        optional "targets" key, zero-padded [K, graph_cap] with column
        0 real."""
        from ggnn_tpu.data.packing import (_extract_labels,
                                           _labels_to_values_and_mask)
        values, mask = _labels_to_values_and_mask(
            _extract_labels(g, self.task_ids) if "targets" in g
            else [None] * len(self.task_ids))
        targets = np.zeros((len(self.task_ids), graph_cap), np.float32)
        target_mask = np.zeros_like(targets)
        targets[:, 0] = values
        target_mask[:, 0] = mask
        return targets, target_mask

    def _pack_single_async(self, g: Dict, annotation_size: int):
        """Batch-of-one async pack with a per-topology PACKED-BATCH
        cache: all schedule-derived leaves (initial/sending/receiving
        tables, segments, compact-slot maps) depend only on the
        topology, so a repeat request swaps just the feature/target
        leaves onto the cached batch — no schedule compilation, no
        scatter assembly. First-seen topologies pay the full pipeline
        (through the schedule cache). Cached batches are
        envelope-padded, so the cache is BYTE-bounded (256 MB) on top
        of the entry cap — a big envelope must not let 256 entries pin
        gigabytes of host RAM. Swapped leaves reproduce the packer's
        conventions exactly (zero-pad features to [nodes, hidden];
        targets zero-padded [K, graphs] with column 0 real —
        data/async_schedule.py:1288-1291), pinned bit-identical in
        tests/test_serving.py."""
        import dataclasses as _dc

        cache = self._async_batch_cache
        n = len(g["node_features"])
        key = self._topology_key(g) + (annotation_size,)
        with self._cache_lock:
            cached = cache.get(key)
            if cached is not None:
                cache.move_to_end(key)
        if cached is None:
            batches = list(self._batches([g], annotation_size))
            assert len(batches) == 1
            nbytes = sum(np.asarray(leaf).nbytes for leaf in
                         jax.tree_util.tree_leaves(batches[0]))
            if nbytes <= self._ASYNC_BATCH_CACHE_BYTES:
                with self._cache_lock:
                    if key not in cache:
                        cache[key] = (batches[0], nbytes)
                        self._async_batch_cache_bytes += nbytes
                        while (len(cache) > self._ASYNC_BATCH_CACHE_CAP
                               or self._async_batch_cache_bytes
                               > self._ASYNC_BATCH_CACHE_BYTES):
                            _, (_, old_bytes) = cache.popitem(last=False)
                            self._async_batch_cache_bytes -= old_bytes
            return batches[0]
        cached = cached[0]
        hidden = int(self.config["hidden_size"])
        feats = np.zeros((cached.node_capacity, hidden), np.float32)
        feats[:n, :annotation_size] = np.asarray(g["node_features"],
                                                 dtype=np.float32)
        targets, target_mask = self._single_graph_targets(
            g, cached.graph_capacity)
        return _dc.replace(cached, node_features=feats,
                           targets=targets, target_mask=target_mask)

    def _pack_single_dense(self, g: Dict, annotation_size: int):
        """One-graph bucket pack for the dense family (the serving
        latency path): picks the graph's bucket and fills row 0 of a
        zeroed [batch_size, ...] DenseGraphBatch directly — BIT-identical
        to the corpus pipeline's batch for a 1-graph request
        (tests/test_serving.py pins it leaf-for-leaf) while skipping the
        bucketed-dict plumbing. Semantics mirrored from
        data/packing.py:preprocess_dense/preprocess_gcn_dense +
        pack_dense_batches (bucket choice by max(max_vertex+1, rows),
        phantom-vertex validation, [T,V,V] type adjacency vs [1,V,V]
        normalized GCN block, labels->values/mask)."""
        from ggnn_tpu.data.packing import (DENSE_BUCKET_SIZES,
                                           _normalized_dense_adjacency,
                                           build_dense_adjacency)
        from ggnn_tpu.graph import DenseGraphBatch

        cfg = self.config
        sizes = self.adapter._bucket_sizes()
        sizes = np.asarray(DENSE_BUCKET_SIZES if sizes is None else sizes)
        edges = g.get("graph", ())
        n = len(g["node_features"])
        max_vertex = max((v for e in edges for v in (e[0], e[2])),
                         default=-1)
        if max_vertex >= n:
            raise ValueError(
                f"graph 0: edge vertex id {max_vertex} >= "
                f"number of node-feature rows {n}")
        needed = max(max_vertex + 1, n)
        if needed > int(sizes[-1]):
            raise ValueError(
                f"graph with {needed} vertices exceeds the largest "
                f"bucket ({int(sizes[-1])})")
        v = int(sizes[int(np.argmax(sizes >= needed))])
        b_cap = int(cfg["batch_size"])
        hidden = int(cfg["hidden_size"])

        init = np.zeros((b_cap, v, hidden), np.float32)
        init[0, :n, :annotation_size] = np.asarray(g["node_features"],
                                                   dtype=np.float32)
        node_mask = np.zeros((b_cap, v), np.float32)
        node_mask[0, :n] = 1.0
        if self.variant == "gcn_blocked":
            adjacency = np.zeros((b_cap, 1, v, v),
                                 self._dense_adjacency_dtype())
            adjacency[0, 0, :n, :n] = _normalized_dense_adjacency(edges, n)
        else:
            t_dim = self.meta.num_edge_types
            adjacency = np.zeros((b_cap, t_dim, v, v),
                                 self._dense_adjacency_dtype())
            adjacency[0] = build_dense_adjacency(edges, v, t_dim,
                                                 cfg["tie_fwd_bkwd"])
        targets, target_mask = self._single_graph_targets(g, b_cap)
        return DenseGraphBatch(
            node_features=init, adjacency=adjacency, node_mask=node_mask,
            targets=targets, target_mask=target_mask,
            num_graphs=np.int32(1))

    def _dense_adjacency_dtype(self):
        """Adjacency dtype of the dense-family serving batches. Live
        predictors match the training pipeline (bf16 rides the native
        packer only; the python packer emits f32 — numerics are equal
        either way, the model casts at compute time). ExportedPredictor
        OVERRIDES this from the artifact's baked signatures: the
        serving host's native-library availability must not change the
        shape/dtype dispatch key a .ggnnx was exported with (round-5
        review)."""
        cfg = self.config
        if (self.variant != "gcn_blocked"
                and cfg.get("compute_dtype", "float32") == "bfloat16"
                and _use_native(cfg)):
            import ml_dtypes
            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(np.float32)

    def _call_dense(self, raw_graphs: Sequence, annotation_size: int):
        if len(raw_graphs) == 1:
            batch = self._pack_single_dense(raw_graphs[0], annotation_size)
            computed = self._forward(self.params, jax.device_put(batch))
            return np.asarray(computed)[:, :1]
        # A request-LOCAL adapter carries this request's annotation
        # width: mutating the shared self.adapter.meta here would race
        # concurrent dense requests of different widths (a Predictor
        # shared across threads is supported — round-5 review; the
        # native packer would read feature rows at the wrong stride).
        kwargs = {"drop_remainder": False}
        adapter = make_adapter(self.variant, self.config, DatasetMeta(
            max_num_vertices=self.meta.max_num_vertices,
            num_edge_types=self.meta.num_edge_types,
            annotation_size=annotation_size), **kwargs)
        # Dense bucketing re-orders graphs; tag each with its request
        # index via a sentinel extra target so outputs scatter back.
        order: List[int] = []
        processed = adapter.preprocess(list(raw_graphs), False)
        if isinstance(processed, native_pack.DenseProcessed):
            for ids in processed.bucket_order:
                order.extend(int(i) for i in ids)
        else:
            # python path: buckets keep first-seen order and each entry
            # carries its original corpus index (preprocess_dense sets
            # "graph_id"), so the order comes straight from the packer —
            # no re-derivation of the bucket-assignment formula.
            for bucket in processed.values():
                order.extend(int(g["graph_id"]) for g in bucket)
        outs: List[np.ndarray] = []
        import dataclasses as _dc
        want_dtype = self._dense_adjacency_dtype()
        for batch in adapter.batches(processed, False):
            # Coerce the adjacency dtype to the predictor's dispatch
            # contract (_dense_adjacency_dtype): the python packer
            # always emits f32 and the native one follows config —
            # an ExportedPredictor's signature match must not depend
            # on which pipeline this host happens to run.
            if np.asarray(batch.adjacency).dtype != want_dtype:
                batch = _dc.replace(batch, adjacency=np.asarray(
                    batch.adjacency).astype(want_dtype))
            computed = self._forward(self.params, jax.device_put(batch))
            outs.append(np.asarray(computed)[:, :int(batch.num_graphs)])
        packed = np.concatenate(outs, axis=1)
        result = np.empty_like(packed)
        result[:, np.asarray(order)] = packed
        return result
