"""Inference serving: checkpoint -> precompiled batched predictor.

The reference's only inference path is `example_evaluation`
(chem_tensorflow_sparse.py:364-376): rebuild the whole training graph,
feed ten molecules, print. For deployment this module provides a
standalone `Predictor`:

  * loads a checkpoint (pickle or Orbax directory) WITHOUT any
    training data — capacities come from the saved config plus a
    `max_nodes`/`max_graphs` serving envelope;
  * compiles ONE forward executable at a fixed packed capacity, so
    every request after the first reuses it (XLA recompiles on shape
    change — the envelope pins the shape);
  * packs incoming graph JSON with the native pipeline and micro-
    batches requests that exceed the envelope.

Example:
    predictor = Predictor.from_checkpoint("run_model_best.pickle",
                                          variant="sparse")
    mu = predictor(molecule_jsons)      # np.ndarray [K, n_graphs]
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

from ggnn_tpu.data import native_pack, packing
from ggnn_tpu.data.loader import DatasetMeta
from ggnn_tpu.models.base import init_output_heads
from ggnn_tpu.native import native_available
from ggnn_tpu.training.checkpoint import _load_payload, restore_checkpoint
from ggnn_tpu.training.variants import make_adapter


class Predictor:
    """Precompiled forward pass for the sparse-family variants."""

    def __init__(self, variant: str, config: Dict, meta: DatasetMeta,
                 state: Dict, max_nodes: int = 2048,
                 max_graphs: int = 256):
        if variant not in ("sparse", "rgcn"):
            raise ValueError("Predictor currently serves the sparse/rgcn "
                             "variants (dense-family graphs are served "
                             "through Runner.predict)")
        self.config = dict(config)
        self.config["batch_size"] = max_nodes
        self.meta = meta
        self.task_ids = list(config["task_ids"])
        self.adapter = make_adapter(variant, self.config, meta)
        self.model = self.adapter.build_model()
        self.params = state["params"]
        self.caps = packing.PackCapacities(
            nodes=max_nodes,
            edges_per_type=max(8 * max_nodes, 64),
            graphs=max_graphs,
        )
        self.adapter.caps = self.caps

        def forward(params, batch):
            final = self.model.forward(params["graph"], batch)
            return self.model.readout(params["heads"], self.task_ids,
                                      final, batch)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, path: str, variant: str = "sparse",
                        max_nodes: int = 2048, max_graphs: int = 256,
                        annotation_size: Optional[int] = None
                        ) -> "Predictor":
        payload = _load_payload(path)
        config = payload["params"]
        # Infer model geometry from the saved weights: edge_weights is
        # [T, H, H] per layer; the head gate MLP input is 2H.
        key = ("params.graph.layers.0.edge_weights"
               if payload.get("sanitized_keys")
               else "['params']['graph']['layers'][0]['edge_weights']")
        w = np.asarray(payload["weights"][key])
        num_edge_types, hidden = int(w.shape[0]), int(w.shape[2])
        meta = DatasetMeta(max_num_vertices=max_nodes,
                           num_edge_types=num_edge_types,
                           annotation_size=annotation_size or hidden)
        # Build a fresh state skeleton then restore into it (reuses the
        # partial-restore machinery + config compat check).
        import jax.random as jrandom
        from ggnn_tpu.models.sparse_ggnn import SparseGGNN
        model = SparseGGNN(config, num_edge_types)
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
        restored, _, _ = restore_checkpoint(path, config, skeleton,
                                            log=lambda *a: None)
        return cls(variant, config, meta, restored,
                   max_nodes=max_nodes, max_graphs=max_graphs)

    def __call__(self, raw_graphs: Sequence) -> np.ndarray:
        """Predict per-task values for raw graph JSON dicts.

        Returns [K, len(raw_graphs)]. Requests larger than the serving
        envelope are transparently micro-batched.
        """
        # Annotation width comes from the request itself (the C packer
        # copies exactly this many feature columns per node).
        annotation_size = len(raw_graphs[0]["node_features"][0])
        if native_available():
            processed = native_pack.preprocess_sparse_native(
                raw_graphs, self.meta.num_edge_types,
                self.config["tie_fwd_bkwd"], self.task_ids, {}, False)
            batches = native_pack.pack_sparse_batches_native(
                processed, self.meta.num_edge_types,
                self.config["tie_fwd_bkwd"], self.caps.nodes, self.caps,
                self.config["hidden_size"], annotation_size,
                False, None)
        else:
            processed = packing.preprocess_sparse(
                raw_graphs, self.meta.num_edge_types,
                self.config["tie_fwd_bkwd"], self.task_ids, {}, False)
            batches = packing.pack_sparse_batches(
                processed, self.meta.num_edge_types, self.caps.nodes,
                self.caps, self.config["hidden_size"],
                annotation_size, False, None)
        outs: List[np.ndarray] = []
        for batch in batches:
            computed = self._forward(self.params, jax.device_put(batch))
            outs.append(np.asarray(computed)[:, :int(batch.num_graphs)])
        return np.concatenate(outs, axis=1)
