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
    elif variant == "gcn":
        return 1, hidden
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
        self.model = self.adapter.build_model()
        self.params = state["params"]
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

        def forward(params, batch):
            final = self.model.forward(params["graph"], batch)
            return self.model.readout(params["heads"], self.task_ids,
                                      final, batch)

        self._forward = jax.jit(forward)

    # ------------------------------------------------------------ load

    @classmethod
    def from_checkpoint(cls, path: str, variant: str = "sparse",
                        max_nodes: int = 2048, max_graphs: int = 256,
                        annotation_size: Optional[int] = None
                        ) -> "Predictor":
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
            variant=variant, num_edge_types=num_edge_types)
        return cls(variant, config, meta, restored,
                   max_nodes=max_nodes, max_graphs=max_graphs)

    # ----------------------------------------------------------- batches

    def _batches(self, raw_graphs: Sequence, annotation_size: int):
        cfg = self.config
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
            processed = packing.preprocess_gcn(raw_graphs, self.task_ids,
                                               {}, False)
            return packing.pack_gcn_batches(
                processed, node_budget, self.caps, cfg["hidden_size"],
                annotation_size, False, None)
        if self.variant == "async":
            processed = async_schedule.preprocess_async(
                raw_graphs, self.meta.num_edge_types, cfg["tie_fwd_bkwd"],
                cfg["propagation_rounds"], cfg["propagation_substeps"],
                self.task_ids, {}, False)
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
        annotation_size = len(raw_graphs[0]["node_features"][0])
        for i, g in enumerate(raw_graphs):
            if (not g.get("node_features")
                    or len(g["node_features"][0]) != annotation_size):
                raise ValueError(
                    f"graph {i}: node_features must be non-empty with a "
                    f"consistent width ({annotation_size}) across the "
                    "request")
        if self.variant in _DENSE_FAMILY:
            return self._call_dense(raw_graphs, annotation_size)
        outs: List[np.ndarray] = []
        for batch in self._batches(raw_graphs, annotation_size):
            computed = self._forward(self.params, jax.device_put(batch))
            outs.append(np.asarray(computed)[:, :int(batch.num_graphs)])
        return np.concatenate(outs, axis=1)

    def _call_dense(self, raw_graphs: Sequence, annotation_size: int):
        # Dense bucketing re-orders graphs; tag each with its request
        # index via a sentinel extra target so outputs scatter back.
        order: List[int] = []
        processed = self.adapter.preprocess(list(raw_graphs), False)
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
        self.adapter.meta = DatasetMeta(
            max_num_vertices=self.meta.max_num_vertices,
            num_edge_types=self.meta.num_edge_types,
            annotation_size=annotation_size)
        outs: List[np.ndarray] = []
        for batch in self.adapter.batches(processed, False):
            computed = self._forward(self.params, jax.device_put(batch))
            outs.append(np.asarray(computed)[:, :int(batch.num_graphs)])
        packed = np.concatenate(outs, axis=1)
        result = np.empty_like(packed)
        result[:, np.asarray(order)] = packed
        return result
