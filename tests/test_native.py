"""Native (C++) packer parity: in eval mode the batches must be
bit-identical to the pure-python pipeline."""

import numpy as np
import pytest

from ggnn_tpu.data import packing
from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native packer unavailable")


def _assert_batches_equal(a, b):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("tie", [True, False])
def test_dense_native_matches_python(tie):
    data = synthetic_molecules(120, seed=2)
    meta = infer_metadata([data], tie)
    bucketed, bsz = packing.preprocess_dense(
        data, meta.num_edge_types, tie, [0], {}, False)
    py_batches = list(packing.pack_dense_batches(
        bucketed, bsz, 16, 24, meta.annotation_size, False,
        drop_remainder=False))

    proc = native_pack.preprocess_dense_native(data, [0], {}, False)
    nat_batches = list(native_pack.pack_dense_batches_native(
        proc, 16, 24, meta.annotation_size, meta.num_edge_types, tie,
        False, drop_remainder=False))

    assert len(py_batches) == len(nat_batches)
    for a, b in zip(py_batches, nat_batches):
        _assert_batches_equal(a, b)


def test_gcn_dense_native_matches_python():
    """The C normalization (pack_gcn_dense_batch) replicates the numpy
    pipeline's float semantics exactly — eval batches bit-identical,
    including the D^{-1/2}(A+I)D^{-1/2} weights."""
    data = synthetic_molecules(120, seed=2)
    meta = infer_metadata([data], True)
    bs = np.array([16, 32])
    bucketed, bsz = packing.preprocess_gcn_dense(
        data, [0], {}, False, bucket_sizes=bs)
    py_batches = list(packing.pack_dense_batches(
        bucketed, bsz, 16, 24, meta.annotation_size, False,
        drop_remainder=False))
    proc = native_pack.preprocess_gcn_dense_native(
        data, [0], {}, False, bucket_sizes=bs)
    nat_batches = list(native_pack.pack_gcn_dense_batches_native(
        proc, 16, 24, meta.annotation_size, False))
    assert len(py_batches) == len(nat_batches)
    for a, b in zip(py_batches, nat_batches):
        _assert_batches_equal(a, b)


def test_gcn_edge_list_native_matches_python():
    """The C GCN edge-list packer (pack_gcn_batch) replicates the
    numpy pipeline exactly — normalized COO (row-major per graph,
    node-id offsets, fl(fl(d_i·a_ij)·d_j) weights), features, graph
    ids, capacity planning — bit-identical eval batches, including
    self-loop (a_ii = 2.0) and duplicate-edge dedup cases and a
    deliberately split giant graph."""
    import dataclasses

    from ggnn_tpu.data.synthetic import synthetic_giant_graph

    cases = [
        ("mols", synthetic_molecules(200, seed=3), 500),
        ("giant", synthetic_giant_graph(1200, seed=1), 2500),
        ("selfloop", [{"targets": [[0.5]],
                       "node_features": [[1, 0, 0, 0, 0]] * 3,
                       "graph": [[0, 1, 1], [1, 1, 2], [1, 2, 2],
                                 [0, 1, 1]]}], 500),
    ]
    for label, data, budget in cases:
        proc_py = packing.preprocess_gcn(data, [0], {}, False)
        caps = packing.plan_gcn_capacities(proc_py, budget)
        proc_nat = native_pack.preprocess_gcn_native(data, [0], {}, False)
        assert caps == native_pack.plan_gcn_capacities_native(
            proc_nat, budget), label
        py_batches = list(packing.pack_gcn_batches(
            proc_py, budget, caps, 16, 5, False, None))
        nat_batches = list(native_pack.pack_gcn_batches_native(
            proc_nat, budget, caps, 16, 5, False, None))
        assert len(py_batches) == len(nat_batches), label
        for a, b in zip(py_batches, nat_batches):
            for f in dataclasses.fields(a):
                x = np.asarray(getattr(a, f.name))
                y = np.asarray(getattr(b, f.name))
                assert x.dtype == y.dtype, (label, f.name)
                np.testing.assert_array_equal(
                    x, y, err_msg=f"{label}: {f.name}")


def test_gcn_edge_list_native_overflow_raises():
    data = synthetic_molecules(40, seed=3)
    proc = native_pack.preprocess_gcn_native(data, [0], {}, False)
    caps = native_pack.plan_gcn_capacities_native(proc, 500)
    import dataclasses as _dc
    bad = _dc.replace(caps, edges_per_type=8)
    with pytest.raises(ValueError, match="capacit"):
        list(native_pack.pack_gcn_batches_native(
            proc, 500, bad, 16, 5, False, None))


@pytest.mark.parametrize("tie", [True, False])
def test_sparse_native_matches_python(tie):
    data = synthetic_molecules(100, seed=4)
    meta = infer_metadata([data], tie)
    py_proc = packing.preprocess_sparse(
        data, meta.num_edge_types, tie, [0], {}, False)
    caps = packing.plan_capacities(py_proc, meta.num_edge_types, 400)
    py_batches = list(packing.pack_sparse_batches(
        py_proc, meta.num_edge_types, 400, caps, 24,
        meta.annotation_size, False, None))

    nat_proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, tie, [0], {}, False)
    nat_caps = native_pack.plan_capacities_native(nat_proc, 400)
    assert nat_caps == caps
    nat_batches = list(native_pack.pack_sparse_batches_native(
        nat_proc, meta.num_edge_types, tie, 400, nat_caps, 24,
        meta.annotation_size, False, None))

    assert len(py_batches) == len(nat_batches)
    for a, b in zip(py_batches, nat_batches):
        _assert_batches_equal(a, b)


def test_sparse_native_with_ell_layouts():
    data = synthetic_molecules(60, seed=6)
    meta = infer_metadata([data], True)
    nat_proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, True, [0], {}, False)
    caps = native_pack.plan_capacities_native(nat_proc, 300)
    batches = list(native_pack.pack_sparse_batches_native(
        nat_proc, meta.num_edge_types, True, 300, caps, 16,
        meta.annotation_size, False, None, ell_block=8, ell_k=64))
    assert batches and batches[0].ell_fwd_src is not None
    for b in batches:
        real = b.ell_fwd_tgt[b.ell_fwd_tgt < b.ell_fwd_tgt.max()]
        assert len(real) == int(b.edge_mask.sum())


def test_training_mode_shuffles_and_keeps_label_semantics():
    data = synthetic_molecules(80, seed=8)
    meta = infer_metadata([data], True)
    rng = np.random.RandomState(0)
    proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, True, [0], {"0": 0.5}, True, rng)
    # Half the corpus (per shuffled order) has blanked labels.
    assert abs(float(proc.corpus.target_mask.sum()) - 40.0) <= 1.0
    caps = native_pack.plan_capacities_native(proc, 300)
    batches = list(native_pack.pack_sparse_batches_native(
        proc, meta.num_edge_types, True, 300, caps, 16,
        meta.annotation_size, True, np.random.RandomState(1)))
    total = sum(int(b.num_graphs) for b in batches)
    assert total == 80


def test_corrupt_input_raises_not_corrupts():
    """Edges referencing nonexistent vertices must raise at flatten time
    (the C kernels index raw buffers with these ids)."""
    bad = [{"targets": [[0.1]],
            "graph": [[0, 1, 7]],  # vertex 7 doesn't exist
            "node_features": [[1, 0], [0, 1]]}]
    with pytest.raises(ValueError, match="vertex"):
        native_pack.FlatCorpus.from_raw(bad, [0])


def test_graph_too_big_for_buckets_raises():
    big = [{"targets": [[0.1]],
            "graph": [[0, 1, 40]],
            "node_features": [[1, 0]] * 41}]
    with pytest.raises(ValueError, match="bucket"):
        native_pack.preprocess_dense_native(
            big, [0], {}, False, bucket_sizes=np.array([8, 32]))


def test_isolated_trailing_nodes_fit_bucket():
    """A graph with feature rows beyond the max edge-referenced vertex
    must land in a bucket big enough for all its rows (native path used
    to write out of bounds here; the python path used to raise)."""
    data = [{"targets": [[0.5]],
             "graph": [[0, 1, 1], [1, 2, 2]],  # max vertex 2 -> bucket 4
             "node_features": [[1, 0]] * 10},  # ...but 10 feature rows
            {"targets": [[0.2]],
             "graph": [[0, 1, 1]],
             "node_features": [[0, 1], [1, 0]]}]
    sizes = np.array([4, 6, 12])
    proc = native_pack.preprocess_dense_native(
        data, [0], {}, False, bucket_sizes=sizes)
    assert proc.bucket_v[0] == 12  # 10 rows need the 12-bucket
    batches = list(native_pack.pack_dense_batches_native(
        proc, 4, 16, 2, 4, True, False, drop_remainder=False))
    big = [b for b in batches if b.node_features.shape[1] == 12][0]
    assert float(big.node_mask.sum()) == 10.0
    # Python path agrees (same bucket choice, no raise).
    bucketed, bsz = packing.preprocess_dense(
        data, 4, True, [0], {}, False, bucket_sizes=sizes)
    py = list(packing.pack_dense_batches(
        bucketed, bsz, 4, 16, 2, False, drop_remainder=False))
    for a, b in zip(py, batches):
        _assert_batches_equal(a, b)


def test_trailing_nodes_exceeding_largest_bucket_raise():
    data = [{"targets": [[0.5]],
             "graph": [[0, 1, 1]],
             "node_features": [[1, 0]] * 20}]
    sizes = np.array([4, 8])
    with pytest.raises(ValueError, match="bucket"):
        native_pack.preprocess_dense_native(
            data, [0], {}, False, bucket_sizes=sizes)
    with pytest.raises(ValueError, match="bucket"):
        packing.preprocess_dense(data, 4, True, [0], {}, False,
                                 bucket_sizes=sizes)


def test_ell_overflow_raises_not_degrades():
    """A batch whose per-block edge count exceeds the planned ell_k must
    RAISE — silently degrading one batch to a plain GraphBatch changes
    the stream's pytree class mid-epoch, which jitted/stacked consumers
    cannot absorb. Both packers enforce the same contract (round-5
    review: they used to contradict each other). An adequately planned
    ell_k emits a uniform ELLGraphBatch stream."""
    from ggnn_tpu.graph import ELLGraphBatch
    data = synthetic_molecules(40, seed=11)
    meta = infer_metadata([data], True)
    nat_proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, True, [0], {}, False)
    caps = native_pack.plan_capacities_native(nat_proc, 300)
    with pytest.raises(ValueError, match="ELL layout overflow"):
        list(native_pack.pack_sparse_batches_native(
            nat_proc, meta.num_edge_types, True, 300, caps, 16,
            meta.annotation_size, False, None, ell_block=8, ell_k=1))
    proc = packing.preprocess_sparse(data, meta.num_edge_types, True,
                                     [0], {}, False)
    pcaps = packing.plan_capacities(proc, meta.num_edge_types, 300)
    with pytest.raises(ValueError, match="ELL layout overflow"):
        list(packing.pack_sparse_batches(
            proc, meta.num_edge_types, 300, pcaps, 16,
            meta.annotation_size, False, None, ell_block=8, ell_k=1))
    # Adequate ell_k: every batch is a fully-formed ELLGraphBatch.
    batches = list(native_pack.pack_sparse_batches_native(
        nat_proc, meta.num_edge_types, True, 300, caps, 16,
        meta.annotation_size, False, None, ell_block=8, ell_k=64))
    assert batches
    assert all(isinstance(b, ELLGraphBatch) and b.ell_fwd_src is not None
               for b in batches)


def test_native_feature_geometry_validated():
    """annotation_size/hidden_size mismatches must raise BEFORE the C
    memcpy (a mismatch is a heap overflow, not an exception, in C)."""
    import pytest

    from ggnn_tpu.data import native_pack
    from ggnn_tpu.data.synthetic import synthetic_molecules

    if not native_available():
        pytest.skip("native library unavailable")
    data = synthetic_molecules(4, seed=0)  # 5-wide annotations
    proc = native_pack.preprocess_sparse_native(data, 4, True, [0], {},
                                                False)
    caps = native_pack.plan_capacities_native(proc, 100)
    with pytest.raises(ValueError, match="corpus feature width"):
        list(native_pack.pack_sparse_batches_native(
            proc, 4, True, 100, caps, 16, 3, False, None))  # A=3 != 5
    with pytest.raises(ValueError, match="hidden_size"):
        list(native_pack.pack_sparse_batches_native(
            proc, 4, True, 100, caps, 4, 5, False, None))  # H=4 < A=5


def test_native_accepts_empty_graph_rows():
    """A zero-node zero-edge corpus entry must not trip the vertex-range
    validation (max_vertex inits to 0 against node_counts == 0)."""
    from ggnn_tpu.data.native_pack import FlatCorpus

    corpus = FlatCorpus.from_raw(
        [{"targets": [[0.5]], "graph": [], "node_features": []},
         {"targets": [[0.1]], "graph": [[0, 1, 1]],
          "node_features": [[1, 0], [0, 1]]}], [0])
    assert corpus.num_graphs == 2
