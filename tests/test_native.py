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
