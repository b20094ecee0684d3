"""Per-variant adapters bundling model construction, preprocessing and
packing behind one interface, so the Runner (training/runner.py) is
model-agnostic — the analog of the reference's subclass hook contract
(process_raw_graphs / prepare_specific_graph_model /
make_minibatch_iterator, chem_tensorflow.py:130-212).
"""

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ggnn_tpu.data import packing
from ggnn_tpu.data import async_schedule
from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import DatasetMeta
from ggnn_tpu.native import native_available
from ggnn_tpu.models.async_ggnn import AsyncGGNN
from ggnn_tpu.models.dense_ggnn import DenseGGNN
from ggnn_tpu.models.gcn import GCN
from ggnn_tpu.models.sparse_ggnn import SparseGGNN


def _use_native(config: Dict) -> bool:
    """Native C++ batch assembly (data/native_pack.py): ~20-60x faster
    host packing, bit-identical eval batches. On by default when the
    library builds; `"native_pack": false` (or GGNN_TPU_NO_NATIVE=1)
    forces the pure-python pipeline."""
    return bool(config.get("native_pack", True)) and native_available()


def _nonempty(p) -> bool:
    if isinstance(p, (list, tuple, dict)):
        return len(p) > 0
    return p is not None


_warned_tpu_budget = False


def _maybe_warn_tpu_node_budget(config: Dict, key: str = "batch_size",
                                cap: int = 50000,
                                hint: str = "~20k nodes/batch is ~1.7x "
                                "faster per graph (see "
                                "configs/sparse_tpu.json and "
                                "benchmarks/README.md).") -> None:
    """One-shot perf hint: the reference-parity node budgets
    (batch_size=100000 nodes, chem_tensorflow_sparse.py:43;
    num_nodes=100000, chem_tensorflow_async.py:43) are measured
    per-graph slowdowns on TPU — 1.7x for sparse/GCN vs ~20k-node
    batches, 2.9x for async vs ~10k (benchmarks/README.md) — batches
    past the sweet spot just stretch the step without adding MXU
    occupancy (and for async they additionally force backward-pass
    rematerialization)."""
    global _warned_tpu_budget
    if _warned_tpu_budget or config.get(key, 0) <= cap:
        return
    try:
        import jax
        if jax.default_backend() not in ("tpu", "axon"):
            return
    except Exception:
        return
    _warned_tpu_budget = True
    # `hint` is a complete sentence: no format-string parenthesis
    # balancing across call sites.
    print("HINT: node budget %s=%d packs >%dk-node batches; on TPU %s"
          % (key, config[key], cap // 1000, hint))


class SparseAdapter:
    name = "sparse"

    def __init__(self, config: Dict, meta: DatasetMeta):
        self.config = config
        self.meta = meta
        self.caps = None

    def build_model(self, edge_axis=None):
        return SparseGGNN(self.config, self.meta.num_edge_types,
                          edge_axis=edge_axis)

    def preprocess(self, raw, is_training: bool,
                   rng: Optional[np.random.RandomState] = None):
        if _use_native(self.config):
            return native_pack.preprocess_sparse_native(
                raw, self.meta.num_edge_types, self.config["tie_fwd_bkwd"],
                self.config["task_ids"], self.config["task_sample_ratios"],
                is_training, rng)
        return packing.preprocess_sparse(
            raw, self.meta.num_edge_types, self.config["tie_fwd_bkwd"],
            self.config["task_ids"], self.config["task_sample_ratios"],
            is_training, rng)

    def plan(self, *processed_lists):
        _maybe_warn_tpu_node_budget(self.config)
        margin = self.config.get("pack_margin")
        caps = [
            native_pack.plan_capacities_native(p, self.config["batch_size"],
                                               margin=margin)
            if isinstance(p, native_pack.SparseProcessed)
            else packing.plan_capacities(p, self.meta.num_edge_types,
                                         self.config["batch_size"],
                                         margin=margin)
            for p in processed_lists if _nonempty(p)]
        if not caps:
            raise ValueError(
                "every data split is empty — nothing to plan capacities "
                "over (check the data files / --restrict_data / "
                "task_sample_ratios)")
        # Merge EVERY field across splits — dropping edges_all here would
        # silently disable the type-combined lane (a ~2.7x slowdown on
        # the sparse train step).
        self.caps = packing.PackCapacities(
            nodes=max(c.nodes for c in caps),
            edges_per_type=max(c.edges_per_type for c in caps),
            graphs=max(c.graphs for c in caps),
            edges_all=max(c.edges_all for c in caps),
        )
        return self.caps

    def _pack(self, processed, is_training, rng):
        # (The round-1 ell_block/ell_k pass-throughs are gone with the
        # archived ELL config surface; the packers still accept them
        # for the archived kernel's direct tests.)
        if isinstance(processed, native_pack.SparseProcessed):
            return native_pack.pack_sparse_batches_native(
                processed, self.meta.num_edge_types,
                self.config["tie_fwd_bkwd"], self.config["batch_size"],
                self.caps, self.config["hidden_size"],
                self.meta.annotation_size, is_training, rng)
        return packing.pack_sparse_batches(
            processed, self.meta.num_edge_types, self.config["batch_size"],
            self.caps, self.config["hidden_size"], self.meta.annotation_size,
            is_training, rng)

    def batches(self, processed, is_training: bool,
                rng: Optional[np.random.RandomState] = None) -> Iterator:
        return self._pack(processed, is_training, rng)


class DenseAdapter:
    name = "dense"

    def __init__(self, config: Dict, meta: DatasetMeta,
                 drop_remainder: Optional[bool] = None):
        self.config = config
        self.meta = meta
        # Config key so CLI users can disable the reference's silent
        # bucket-remainder dropping (chem_tensorflow_dense.py:160)
        # without library access; the kwarg (tests/serving) wins.
        if drop_remainder is None:
            drop_remainder = bool(config.get("drop_remainder", True))
        self.drop_remainder = drop_remainder
        self.bucket_sizes = None

    def build_model(self):
        return DenseGGNN(self.config, self.meta.num_edge_types)

    def _bucket_sizes(self):
        """Config `dense_bucket_sizes` overrides the reference bucket
        table — numerically identical (padding is masked/disconnected),
        but fewer distinct shapes means fewer compilations; XLA compiles
        one program per bucket shape. The `blocked` variant defaults to
        a coarse table for this reason."""
        sizes = self.config.get("dense_bucket_sizes")
        return None if sizes is None else np.asarray(sizes)

    def preprocess(self, raw, is_training: bool,
                   rng: Optional[np.random.RandomState] = None):
        if _use_native(self.config):
            return native_pack.preprocess_dense_native(
                raw, self.config["task_ids"],
                self.config["task_sample_ratios"], is_training, rng,
                bucket_sizes=self._bucket_sizes(),
                num_edge_types=self.meta.num_edge_types,
                tie_fwd_bkwd=self.config["tie_fwd_bkwd"])
        bucketed, bucket_sizes = packing.preprocess_dense(
            raw, self.meta.num_edge_types, self.config["tie_fwd_bkwd"],
            self.config["task_ids"], self.config["task_sample_ratios"],
            is_training, rng, bucket_sizes=self._bucket_sizes())
        self.bucket_sizes = bucket_sizes
        return bucketed

    def plan(self, *processed_lists):
        return None  # dense shapes come from the bucket table

    def batches(self, processed, is_training: bool,
                rng: Optional[np.random.RandomState] = None) -> Iterator:
        if isinstance(processed, native_pack.DenseProcessed):
            adj_dtype = np.float32
            if self.config.get("compute_dtype", "float32") == "bfloat16":
                import ml_dtypes
                adj_dtype = np.dtype(ml_dtypes.bfloat16)
            return native_pack.pack_dense_batches_native(
                processed, self.config["batch_size"],
                self.config["hidden_size"], self.meta.annotation_size,
                self.meta.num_edge_types, self.config["tie_fwd_bkwd"],
                is_training, rng, drop_remainder=self.drop_remainder,
                adjacency_dtype=adj_dtype)
        return packing.pack_dense_batches(
            processed, self.bucket_sizes, self.config["batch_size"],
            self.config["hidden_size"], self.meta.annotation_size,
            is_training, rng, drop_remainder=self.drop_remainder)


class GCNAdapter:
    name = "gcn"

    def __init__(self, config: Dict, meta: DatasetMeta):
        self.config = config
        self.meta = meta
        self.caps = None

    def build_model(self, edge_axis=None):
        return GCN(self.config, edge_axis=edge_axis)

    def preprocess(self, raw, is_training: bool,
                   rng: Optional[np.random.RandomState] = None):
        if _use_native(self.config):
            return native_pack.preprocess_gcn_native(
                raw, self.config["task_ids"],
                self.config["task_sample_ratios"], is_training, rng)
        return packing.preprocess_gcn(
            raw, self.config["task_ids"], self.config["task_sample_ratios"],
            is_training, rng)

    def plan(self, *processed_lists):
        _maybe_warn_tpu_node_budget(
            self.config,
            hint="~20k nodes/batch is ~1.6x faster per graph "
                 "(flat below 20k; see configs/sparse_tpu.json and "
                 "benchmarks/README.md).")
        margin = self.config.get("pack_margin")
        caps = [native_pack.plan_gcn_capacities_native(
                    p, self.config["batch_size"], margin=margin)
                if isinstance(p, native_pack.GCNProcessed)
                else packing.plan_gcn_capacities(
                    p, self.config["batch_size"], margin=margin)
                for p in processed_lists if _nonempty(p)]
        if not caps:
            raise ValueError(
                "every data split is empty — nothing to plan capacities "
                "over (check the data files / --restrict_data / "
                "task_sample_ratios)")
        self.caps = packing.PackCapacities(
            nodes=max(c.nodes for c in caps),
            edges_per_type=max(c.edges_per_type for c in caps),
            graphs=max(c.graphs for c in caps),
        )
        return self.caps

    def batches(self, processed, is_training: bool,
                rng: Optional[np.random.RandomState] = None) -> Iterator:
        if isinstance(processed, native_pack.GCNProcessed):
            return native_pack.pack_gcn_batches_native(
                processed, self.config["batch_size"], self.caps,
                self.config["hidden_size"], self.meta.annotation_size,
                is_training, rng)
        return packing.pack_gcn_batches(
            processed, self.config["batch_size"], self.caps,
            self.config["hidden_size"], self.meta.annotation_size,
            is_training, rng)


class GcnBlockedAdapter(DenseAdapter):
    """`gcn_blocked`: GCN math on the bucketed dense path
    (models/gcn.py:BlockedGCN). Reuses DenseAdapter's batching —
    preprocess emits the same bucketed dict shape with a [1, V, V]
    normalized-float adjacency block — with GCN preprocessing and
    model construction swapped in. Never drops remainders (this is a
    framework-native variant, not a reference-parity one). The native
    path (native/packer.cpp:pack_gcn_dense_batch) computes the
    normalization in C with the numpy pipeline's exact float semantics
    — eval batches are bit-identical (tests/test_native.py)."""
    name = "gcn_blocked"

    def __init__(self, config: Dict, meta: DatasetMeta,
                 drop_remainder: Optional[bool] = None):
        if drop_remainder is None:
            # Framework-native default is False, but the documented
            # config key still applies (round-5 review).
            drop_remainder = bool(config.get("drop_remainder", False))
        super().__init__(config, meta, drop_remainder=drop_remainder)

    def build_model(self):
        from ggnn_tpu.models.gcn import BlockedGCN
        return BlockedGCN(self.config)

    def preprocess(self, raw, is_training: bool,
                   rng: Optional[np.random.RandomState] = None):
        if _use_native(self.config):
            return native_pack.preprocess_gcn_dense_native(
                raw, self.config["task_ids"],
                self.config["task_sample_ratios"], is_training, rng,
                bucket_sizes=self._bucket_sizes())
        bucketed, bucket_sizes = packing.preprocess_gcn_dense(
            raw, self.config["task_ids"], self.config["task_sample_ratios"],
            is_training, rng, bucket_sizes=self._bucket_sizes())
        self.bucket_sizes = bucket_sizes
        return bucketed

    def batches(self, processed, is_training: bool,
                rng: Optional[np.random.RandomState] = None) -> Iterator:
        if isinstance(processed, native_pack.DenseProcessed):
            return native_pack.pack_gcn_dense_batches_native(
                processed, self.config["batch_size"],
                self.config["hidden_size"], self.meta.annotation_size,
                is_training, rng, drop_remainder=self.drop_remainder)
        return packing.pack_dense_batches(
            processed, self.bucket_sizes, self.config["batch_size"],
            self.config["hidden_size"], self.meta.annotation_size,
            is_training, rng, drop_remainder=self.drop_remainder)


class AsyncAdapter:
    name = "async"

    def __init__(self, config: Dict, meta: DatasetMeta):
        self.config = config
        self.meta = meta
        self.caps = None
        # Corpus-level epoch-packing caches, keyed by processed-list
        # identity (the held reference keeps each id() valid). Built
        # lazily on the first epoch over a corpus; FIFO-capped so a
        # long-lived adapter fed many distinct corpora (a service, a
        # notebook re-preprocessing per run) cannot pin them all —
        # each entry holds the full processed list, and in
        # async_epoch_shuffle="batches" mode every packed batch too.
        self._pack_caches: Dict[int, Any] = {}
        # Packed-batch caches for async_epoch_shuffle="batches".
        self._batch_caches: Dict[int, Any] = {}
        self._cache_cap = 4  # a Runner holds train + valid

    def _cache_put(self, caches: Dict[int, Any], key: int, value) -> None:
        while len(caches) >= self._cache_cap:
            caches.pop(next(iter(caches)))
        caches[key] = value

    def build_model(self):
        return AsyncGGNN(self.config, self.meta.num_edge_types)

    def preprocess(self, raw, is_training: bool,
                   rng: Optional[np.random.RandomState] = None):
        return async_schedule.preprocess_async(
            raw, self.meta.num_edge_types, self.config["tie_fwd_bkwd"],
            self.config["propagation_rounds"],
            self.config["propagation_substeps"],
            self.config["task_ids"], self.config["task_sample_ratios"],
            is_training, rng)

    def plan(self, *processed_lists):
        _maybe_warn_tpu_node_budget(
            self.config, key="num_nodes", cap=25000,
            hint="~10k nodes/batch is ~2.9x faster per graph and skips "
                 "backward rematerialization (see configs/async_tpu.json "
                 "and benchmarks/README.md).")
        # One merged planning pass over every split (train + valid must
        # compile to the same shapes) INCLUDING the segmented-scan plan —
        # dropping `plan` here would silently fall back to the uniform
        # per-(round,step,type)-lane path (~5.6x slower).
        self.caps = async_schedule.plan_async_capacities_multi(
            [p for p in processed_lists if p],
            self.meta.num_edge_types, self.config["num_nodes"],
            self.config["propagation_rounds"],
            margin=self.config.get("pack_margin"))
        return self.caps

    def _pack_cache(self, processed):
        """Per-corpus AsyncPackCache (data/async_schedule.py), built on
        first use; `"async_pack_cache": false` opts out (e.g. a corpus
        mutated between epochs)."""
        if not self.config.get("async_pack_cache", True):
            return None
        entry = self._pack_caches.get(id(processed))
        if entry is not None and entry[0] is processed:
            return entry[1]
        cache = async_schedule.build_async_pack_cache(
            processed, self.config["propagation_rounds"],
            self.config["propagation_substeps"],
            self.meta.num_edge_types)
        self._cache_put(self._pack_caches, id(processed),
                        (processed, cache))
        return cache

    def _pack(self, processed, is_training: bool, rng):
        return async_schedule.pack_async_batches(
            processed, self.meta.num_edge_types, self.config["num_nodes"],
            self.caps, self.config["propagation_rounds"],
            self.config["propagation_substeps"], self.config["hidden_size"],
            self.meta.annotation_size, is_training, rng,
            cache=self._pack_cache(processed))

    def batches(self, processed, is_training: bool,
                rng: Optional[np.random.RandomState] = None) -> Iterator:
        # `"async_epoch_shuffle": "batches"` (configs/async_tpu.json)
        # trades the reference's per-epoch GRAPH shuffle for a
        # batch-ORDER shuffle over a one-time pack: composition is
        # fixed across epochs (packed in preprocess order), so epochs
        # cost zero host packing — the device stream becomes the
        # pipeline bottleneck. Default "graphs" keeps reference
        # semantics (chem_tensorflow_async.py:341) with the cached
        # vectorized packer. Memory: holds every packed batch of the
        # corpus (~hundreds of MB at the 10k-node budget on QM9 scale).
        mode = self.config.get("async_epoch_shuffle", "graphs")
        if mode not in ("graphs", "batches"):
            raise ValueError(
                f"async_epoch_shuffle must be 'graphs' or 'batches', "
                f"got {mode!r}")
        if mode == "batches":
            entry = self._batch_caches.get(id(processed))
            if entry is None or entry[0] is not processed:
                packed = list(self._pack(processed, False, None))
                entry = (processed, packed)
                self._cache_put(self._batch_caches, id(processed), entry)
            packed = entry[1]
            if is_training and rng is not None:
                return (packed[i] for i in rng.permutation(len(packed)))
            return iter(packed)
        return self._pack(processed, is_training, rng)


_ADAPTERS = {
    "sparse": SparseAdapter,
    "rgcn": SparseAdapter,   # R-GCN = sparse model under RGCN_CONFIG
    "dense": DenseAdapter,
    "blocked": DenseAdapter,  # sparse feature surface, dense-path compute
    "gcn": GCNAdapter,
    "gcn_blocked": GcnBlockedAdapter,  # GCN math, dense-path compute
    "async": AsyncAdapter,
}


def make_adapter(variant: str, config: Dict, meta: DatasetMeta, **kwargs):
    if variant not in _ADAPTERS:
        raise ValueError(f"unknown model variant '{variant}'")
    if variant == "blocked" and "drop_remainder" not in kwargs:
        # The reference's silent bucket-remainder dropping
        # (chem_tensorflow_dense.py:160) is kept for the `dense` parity
        # variant only; `blocked` is this framework's own variant and
        # processes every graph by default — but the documented
        # `"drop_remainder"` config key must still win (round-5 review:
        # a hard kwarg default made the key silently dead here).
        kwargs["drop_remainder"] = bool(config.get("drop_remainder",
                                                   False))
    return _ADAPTERS[variant](config, meta, **kwargs)
