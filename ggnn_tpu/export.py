"""Deployment artifacts: Predictor -> pinned StableHLO + weights.

The reference has no deployment story — its only inference path rebuilds
the full training graph in-process (chem_tensorflow_sparse.py:364-376).
This module makes serving an *artifact* concern, the standard TPU
production shape (analogous to a TF SavedModel, but via `jax.export`
StableHLO serialization):

  * `export_predictor(predictor, path)` writes one `.ggnnx` zip: the
    serialized device computation (one `jax.export` function per packed
    batch shape — the envelope shape for edge-list/async variants, one
    per bucket for the dense family), the checkpoint weights, and the
    packing metadata needed to serve;
  * `load_predictor(path)` returns an `ExportedPredictor`: the same host
    pipeline (native packers, micro-batching, request validation) but
    the device math is the PINNED StableHLO — later edits to
    `ggnn_tpu/models` or `ggnn_tpu/ops` cannot change what a deployed
    artifact computes (tests/test_export.py proves it by sabotaging the
    live model after export);
  * artifacts lower for BOTH cpu and tpu by default, so one exported on
    a CPU-only CI host serves on TPU chips unchanged (and vice versa);
    `jax.export` carries StableHLO's forward-compatibility guarantees
    across jax releases.

Format (`.ggnnx` = zip):
    meta.json     format_version, variant, config, dataset meta,
                  envelope, platforms, shape-signature -> fn file map
    params.npz    checkpoint weights; each entry's name is the
                  JSON-encoded pytree path (dict keys / list indices),
                  so loading never unpickles — a .ggnnx from an
                  untrusted source cannot execute code on load
                  (np.load runs with allow_pickle=False)
    fn_<i>.bin    jax.export serialization, one per batch shape
"""

import dataclasses
import io
import json
import zipfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
from jax import export as jax_export

from ggnn_tpu.data.loader import DatasetMeta
from ggnn_tpu.serving import _DENSE_FAMILY, Predictor

_FORMAT_VERSION = 2  # v2: params.npz (pickle-free); v1 (params.pkl) retired


def _flatten_params(params) -> Dict[str, np.ndarray]:
    """Nested dict/list pytree of arrays -> {json-path: array}. The
    param trees here are plain dicts and lists (models/*.py
    init_params), so a (key|index)* path is a complete address."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                # str keys only: a non-str dict key (e.g. int) would
                # round-trip to a string — a silent pytree-structure
                # change. Fail loudly instead.
                if not isinstance(p.key, str):
                    raise TypeError(
                        f"non-string dict key {p.key!r} at {path}: "
                        ".ggnnx param paths require str dict keys")
                parts.append(p.key)
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(p.idx)
                # Tuples flatten with SequenceKey exactly like lists
                # but _unflatten_params rebuilds LISTS — a tuple node
                # would export cleanly and reload with a different
                # treedef, failing every exported call. Fail at export.
                node = params
                for q in path[:len(parts) - 1]:
                    node = (node[q.key]
                            if isinstance(q, jax.tree_util.DictKey)
                            else node[q.idx])
                if isinstance(node, tuple):
                    raise TypeError(
                        f"tuple params container at {path}: .ggnnx "
                        "stores dict/list pytrees only (a tuple would "
                        "silently reload as a list)")
            else:
                raise TypeError(
                    f"unsupported params container at {path}: {p!r} "
                    "(.ggnnx stores dict/list pytrees only)")
        out[json.dumps(parts)] = np.asarray(leaf)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]):
    """Inverse of `_flatten_params`. Integer path components rebuild
    lists (indices are asserted dense), strings rebuild dicts."""
    root: Dict = {}
    for key in sorted(flat):
        parts = json.loads(key)
        node = root
        for i, p in enumerate(parts[:-1]):
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]

    def materialize(node):
        if not isinstance(node, dict):
            return node
        if node and all(isinstance(k, int) for k in node):
            idxs = sorted(node)
            if idxs != list(range(len(idxs))):
                raise ValueError(f"non-dense list indices {idxs} in params")
            return [materialize(node[i]) for i in idxs]
        if any(isinstance(k, int) for k in node):
            raise ValueError("mixed int/str keys in params path")
        return {k: materialize(v) for k, v in node.items()}

    return materialize(root)


def _register_batch_serialization():
    """Teach jax.export to (de)serialize the batch pytree dataclasses.
    All of them carry empty auxdata (no meta fields), so the auxdata
    codec is trivial; `serialized_name` is the stable wire identifier
    an artifact reader must know."""
    import ggnn_tpu.graph as graph_mod

    for name in ("GraphBatch", "DenseGraphBatch", "GCNGraphBatch",
                 "AsyncGraphBatch", "AsyncSegment", "ELLGraphBatch"):
        cls = getattr(graph_mod, name)
        try:
            jax_export.register_pytree_node_serialization(
                cls,
                serialized_name=f"ggnn_tpu.graph.{name}",
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: ())
        except ValueError:
            pass  # already registered (re-import)


_register_batch_serialization()


def _batch_signature(batch) -> Tuple:
    """Hashable (shape, dtype) tuple over the batch pytree's leaves —
    the dispatch key between packed batches and exported functions.
    The treedef itself is fixed per variant, so leaves suffice."""
    leaves = jax.tree_util.tree_leaves(batch)
    return tuple(
        (tuple(np.shape(l)),
         # getattr first: np.asarray on a device array would pull it
         # to host just to read the dtype.
         str(getattr(l, "dtype", None) or np.asarray(l).dtype))
        for l in leaves)


def _sig_to_json(sig: Tuple) -> List:
    return [[list(shape), dtype] for shape, dtype in sig]


def _sig_from_json(data: List) -> Tuple:
    return tuple((tuple(shape), dtype) for shape, dtype in data)


def _dummy_graph(n_nodes: int, annotation_size: int, n_tasks: int) -> Dict:
    """A minimal valid request graph: a chain of `n_nodes` vertices with
    type-1 edges (valid for any num_edge_types >= 1)."""
    return {
        "targets": [[0.0] for _ in range(n_tasks)],
        "graph": [[i, 1, i + 1] for i in range(n_nodes - 1)],
        "node_features": [[1.0] * annotation_size for _ in range(n_nodes)],
    }


def _example_batches(predictor: Predictor) -> List:
    """One packed batch per distinct device shape the predictor can
    produce: the single envelope shape for edge-list/async variants,
    one per bucket for the dense family (the bucket table IS the
    shape set — serving compiles nothing else)."""
    n_tasks = max(predictor.task_ids) + 1
    ann = 1  # packed feature rows are padded to hidden: width-independent
    if predictor.variant in _DENSE_FAMILY:
        from ggnn_tpu.data.packing import DENSE_BUCKET_SIZES
        sizes = predictor.adapter._bucket_sizes()
        if sizes is None:
            sizes = DENSE_BUCKET_SIZES
        graphs = [_dummy_graph(int(v), ann, n_tasks) for v in sizes]
        # A LOCAL adapter, like serving._call_dense: mutating the
        # caller's live predictor.adapter.meta (annotation_size forced
        # to 1) would persist past the export (round-5 review).
        from ggnn_tpu.training.variants import make_adapter
        adapter = make_adapter(
            predictor.variant, predictor.config, DatasetMeta(
                max_num_vertices=predictor.meta.max_num_vertices,
                num_edge_types=predictor.meta.num_edge_types,
                annotation_size=ann), drop_remainder=False)
        processed = adapter.preprocess(graphs, False)
        return list(adapter.batches(processed, False))
    return list(predictor._batches([_dummy_graph(2, ann, n_tasks)], ann))


def export_predictor(predictor: Predictor, path: str,
                     platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Serialize `predictor`'s device computation + weights to `path`.

    Lowers (does not compile) one function per batch shape for every
    platform in `platforms`; the artifact then serves on any of them.
    Returns `path`.
    """
    params = jax.device_get(predictor.params)
    entries = []
    blobs = []
    seen = set()
    for batch in _example_batches(predictor):
        sig = _batch_signature(batch)
        if sig in seen:
            continue
        seen.add(sig)
        spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a),
                                           np.asarray(a).dtype),
            (params, batch))
        exported = jax_export.export(
            predictor._forward, platforms=tuple(platforms))(*spec)
        fname = f"fn_{len(blobs)}.bin"
        entries.append({"sig": _sig_to_json(sig), "file": fname})
        blobs.append(exported.serialize())
    meta = {
        "format_version": _FORMAT_VERSION,
        "variant": predictor.variant,
        "config": predictor.config,
        "dataset_meta": dataclasses.asdict(predictor.meta),
        "max_nodes": predictor.max_nodes,
        "max_graphs": predictor.max_graphs,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "functions": entries,
    }
    pbuf = io.BytesIO()
    np.savez(pbuf, **_flatten_params(params))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("params.npz", pbuf.getvalue())
        for entry, blob in zip(entries, blobs):
            z.writestr(entry["file"], blob)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return path


class ExportedPredictor(Predictor):
    """A Predictor whose device math is pinned StableHLO from a
    `.ggnnx` artifact. Host-side behavior (packing, validation,
    micro-batching, bucket scatter) is inherited; `_build_forward`
    swaps the live jitted model for a shape-dispatched call into the
    deserialized functions. `self.model` stays None — artifact serving
    never constructs model code."""

    def __init__(self, variant: str, config: Dict, meta: DatasetMeta,
                 state: Dict, exported_fns: Dict, max_nodes: int,
                 max_graphs: int):
        self._exported_fns = {
            sig: jax.jit(fn.call) for sig, fn in exported_fns.items()
        }
        super().__init__(variant, config, meta, state,
                         max_nodes=max_nodes, max_graphs=max_graphs)

    def _dense_adjacency_dtype(self):
        """The ARTIFACT's adjacency dtype, read from the baked
        signatures (the adjacency is the only 4-d leaf of a dense
        batch): serving-host native-library availability must not
        change the shape/dtype dispatch key the artifact was exported
        with — a mismatch would reject every request."""
        import numpy as np
        for sig in self._exported_fns:
            for shape, dtype in sig:
                if len(shape) == 4:
                    return np.dtype(dtype)
        return super()._dense_adjacency_dtype()

    def _build_forward(self):
        self.model = None
        # Artifact weights arrive as host numpy; pin them on device once
        # or every request re-ships the full parameter set (measured 3x
        # the end-to-end latency through the tunneled chip).
        self.params = jax.device_put(self.params)

        def forward(params, batch):
            sig = _batch_signature(batch)
            fn = self._exported_fns.get(sig)
            if fn is None:
                shapes = sorted(str([s for s, _ in k])
                                for k in self._exported_fns)
                raise ValueError(
                    "packed batch shape not present in the artifact "
                    f"(got {[s for s, _ in sig]}; artifact has "
                    f"{shapes}). Re-export with an envelope/bucket "
                    "table covering this request.")
            return fn(params, batch)

        self._forward = forward


def load_predictor(path: str) -> ExportedPredictor:
    """Open a `.ggnnx` artifact written by `export_predictor`."""
    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format_version") != _FORMAT_VERSION:
            remedy = (
                "re-export the checkpoint with this build "
                "(`ggnn-tpu VARIANT --restore CKPT --export-artifact "
                "PATH`) "
                "to migrate it"
                if isinstance(meta.get("format_version"), int)
                and meta["format_version"] < _FORMAT_VERSION
                else "load it with a build that writes this version")
            raise ValueError(
                f"unsupported artifact format_version "
                f"{meta.get('format_version')} (this build reads "
                f"{_FORMAT_VERSION}); {remedy}")
        with np.load(io.BytesIO(z.read("params.npz")),
                     allow_pickle=False) as npz:
            params = _unflatten_params({k: npz[k] for k in npz.files})
        fns = {}
        for entry in meta["functions"]:
            fns[_sig_from_json(entry["sig"])] = jax_export.deserialize(
                bytearray(z.read(entry["file"])))
    dmeta = DatasetMeta(**meta["dataset_meta"])
    return ExportedPredictor(
        meta["variant"], meta["config"], dmeta, {"params": params},
        fns, meta["max_nodes"], meta["max_graphs"])
