"""Tests for preprocessing and static-shape batch packing."""

import numpy as np
import pytest

from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.packing import (
    PackCapacities,
    build_dense_adjacency,
    graph_to_adjacency_lists,
    graph_to_normalized_adjacency,
    pack_dense_batches,
    pack_sparse_batches,
    plan_capacities,
    preprocess_dense,
    preprocess_sparse,
)
from ggnn_tpu.data.synthetic import synthetic_molecules


def tiny_graphs():
    # graph 0: 3 nodes, edges 0-(1)-1, 1-(2)-2 ; graph 1: 2 nodes 0-(1)-1
    return [
        {"targets": [[0.5]], "graph": [[0, 1, 1], [1, 2, 2]],
         "node_features": [[1, 0], [0, 1], [1, 0]]},
        {"targets": [[-0.5]], "graph": [[0, 1, 1]],
         "node_features": [[0, 1], [1, 0]]},
    ]


def test_metadata_inference():
    meta = infer_metadata([tiny_graphs()], tie_fwd_bkwd=True)
    assert meta.max_num_vertices == 2  # max vertex *id*, reference semantics
    assert meta.num_edge_types == 2
    assert meta.annotation_size == 2
    meta_untied = infer_metadata([tiny_graphs()], tie_fwd_bkwd=False)
    assert meta_untied.num_edge_types == 4


def test_adjacency_lists_tied():
    adj, in_deg = graph_to_adjacency_lists([[0, 1, 1], [1, 2, 2]],
                                           num_edge_types=2, tie_fwd_bkwd=True)
    np.testing.assert_array_equal(adj[0], [[0, 1], [1, 0]])
    np.testing.assert_array_equal(adj[1], [[1, 2], [2, 1]])
    assert in_deg[0] == {1: 1, 0: 1}


def test_adjacency_lists_untied_backward_types():
    adj, in_deg = graph_to_adjacency_lists([[0, 1, 1]],
                                           num_edge_types=4, tie_fwd_bkwd=False)
    np.testing.assert_array_equal(adj[0], [[0, 1]])
    np.testing.assert_array_equal(adj[2], [[1, 0]])  # bwd of type 0 -> type 2
    assert 4 not in adj  # the reference's out-of-range bug is fixed


def test_sparse_packing_shapes_and_offsets():
    raw = tiny_graphs()
    processed = preprocess_sparse(raw, num_edge_types=2, tie_fwd_bkwd=True,
                                  task_ids=[0], task_sample_ratios={},
                                  is_training=False)
    caps = PackCapacities(nodes=8, edges_per_type=8, graphs=8)
    batches = list(pack_sparse_batches(
        processed, num_edge_types=2, node_budget=100, caps=caps,
        hidden_size=4, annotation_size=2, is_training=False))
    assert len(batches) == 1
    b = batches[0]
    assert b.node_features.shape == (8, 4)
    assert b.edge_sources.shape == (2, 8)
    assert int(b.num_graphs) == 2
    assert int(b.num_nodes) == 5
    # second graph's nodes are offset by 3
    np.testing.assert_array_equal(b.node_graph_ids[:5], [0, 0, 0, 1, 1])
    assert b.node_graph_ids[5] == 8  # dump slot
    # graph-1 edge 0-(1)-1 offsets to (3,4)/(4,3)
    e0 = b.edge_sources[0][b.edge_mask[0] > 0]
    assert set(map(int, e0)) == {0, 1, 3, 4}
    # padded edge targets point at the dump node
    assert np.all(b.edge_targets[b.edge_mask == 0] == 8)
    # annotations zero-padded to hidden size
    np.testing.assert_array_equal(b.node_features[0], [1, 0, 0, 0])


def test_sparse_packing_respects_node_budget():
    raw = tiny_graphs()
    processed = preprocess_sparse(raw, 2, True, [0], {}, False)
    caps = PackCapacities(nodes=8, edges_per_type=8, graphs=8)
    # budget 4: strict < means graph 0 (3 nodes) fits, graph 1 (2) does not
    batches = list(pack_sparse_batches(processed, 2, 4, caps, 4, 2, False))
    assert [int(b.num_graphs) for b in batches] == [1, 1]


def test_plan_capacities_covers_corpus():
    raw = synthetic_molecules(200, seed=0)
    processed = preprocess_sparse(raw, 4, True, [0], {}, False)
    caps = plan_capacities(processed, num_edge_types=4, node_budget=500)
    batches = list(pack_sparse_batches(processed, 4, 500, caps, 16, 5, False))
    total = sum(int(b.num_graphs) for b in batches)
    assert total == 200
    for b in batches:
        assert b.node_features.shape[0] == caps.nodes
        assert b.edge_sources.shape == (4, caps.edges_per_type)


def test_dense_adjacency_orientation():
    # adjacency[t, dst, src] = 1 (reference dense:30-36)
    amat = build_dense_adjacency([[0, 1, 1]], 3, 2, tie_fwd_bkwd=True)
    assert amat[0, 1, 0] == 1 and amat[0, 0, 1] == 1
    amat_untied = build_dense_adjacency([[0, 1, 1]], 3, 4, tie_fwd_bkwd=False)
    assert amat_untied[0, 1, 0] == 1 and amat_untied[2, 0, 1] == 1


def test_dense_bucketing_and_remainder_drop():
    raw = synthetic_molecules(50, seed=1)
    bucketed, bucket_sizes = preprocess_dense(raw, 4, True, [0], {}, False)
    batches = list(pack_dense_batches(bucketed, bucket_sizes, batch_size=8,
                                      hidden_size=16, annotation_size=5,
                                      is_training=False, drop_remainder=True))
    dropped_total = sum(len(v) for v in bucketed.values()) - sum(
        int(b.num_graphs) for b in batches)
    assert dropped_total > 0  # reference floor-division behavior
    for b in batches:
        assert int(b.num_graphs) == 8
        assert b.adjacency.shape[0] == 8
    # with drop_remainder=False every graph is processed
    batches_all = list(pack_dense_batches(bucketed, bucket_sizes, 8, 16, 5,
                                          False, drop_remainder=False))
    assert sum(int(b.num_graphs) for b in batches_all) == 50


def test_gcn_normalization_matches_reference_math():
    edges = [[0, 1, 1], [1, 2, 2]]
    coo, w = graph_to_normalized_adjacency(edges, 3)
    # Build dense reference result directly:
    adj = np.zeros((3, 3))
    for s, _, d in edges:
        adj[s, d] = adj[d, s] = 1
    adj += np.eye(3)
    dinv = np.diag(np.power(adj.sum(-1), -0.5) + 1e-7)
    want = dinv @ adj @ dinv
    got = np.zeros((3, 3))
    for (i, j), weight in zip(coo, w):
        got[i, j] = weight
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_task_sample_ratios_blank_labels():
    raw = synthetic_molecules(10, seed=2)
    processed = preprocess_sparse(raw, 4, True, [0], {"0": 0.5}, True,
                                  rng=np.random.RandomState(0))
    blanked = sum(1 for g in processed if g["labels"][0] is None)
    assert blanked == 5


def test_packing_determinism_same_seed():
    """SURVEY §5.2: determinism tests instead of sanitizers — the same
    seed must produce identical shuffled batches (python and native)."""
    import numpy as np
    from ggnn_tpu.data import packing, native_pack
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules

    data = synthetic_molecules(60, seed=0)
    meta = infer_metadata([data], True)

    def run(seed):
        rng = np.random.RandomState(seed)
        proc = native_pack.preprocess_sparse_native(
            data, meta.num_edge_types, True, [0], {}, True, rng)
        caps = native_pack.plan_capacities_native(proc, 300)
        return list(native_pack.pack_sparse_batches_native(
            proc, meta.num_edge_types, True, 300, caps, 16,
            meta.annotation_size, True, np.random.RandomState(seed + 1)))

    import jax
    a, b = run(7), run(7)
    for x, y in zip(a, b):
        for lx, ly in zip(jax.tree_util.tree_leaves(x),
                          jax.tree_util.tree_leaves(y)):
            np.testing.assert_array_equal(np.asarray(lx), np.asarray(ly))


def test_runner_determinism_same_seed(tmp_path):
    """Same seed end-to-end: identical first-epoch loss."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.runner import Runner

    def one():
        cfg = default_params_for("sparse")
        cfg.update({"hidden_size": 16, "num_epochs": 1, "batch_size": 300,
                    "random_seed": 5})
        r = Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
                   tensorboard=False,
                   train_data=synthetic_molecules(40, seed=0),
                   valid_data=synthetic_molecules(20, seed=1))
        return r.train()[0]["train_results"][0]

    assert one() == one()


def test_large_graph_capability():
    """Beyond-QM9 capability: a single 3000-node graph packs and runs
    through the sparse model (the edge-list path exists precisely for
    graphs too large to bucket densely)."""
    import numpy as np
    import jax
    from ggnn_tpu.data import native_pack
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.training.config import default_params_for

    rng = np.random.RandomState(0)
    n = 3000
    edges = [[int(i), int(rng.randint(1, 5)), int(rng.randint(0, n))]
             for i in range(n - 1)] + [[0, 1, n - 1]]
    big = {"targets": [[0.5]],
           "graph": edges,
           "node_features": rng.randint(0, 2, size=(n, 5)).tolist()}
    data = [big]
    meta = infer_metadata([data], True)
    proc = native_pack.preprocess_sparse_native(data, meta.num_edge_types,
                                                True, [0], {}, False)
    caps = native_pack.plan_capacities_native(proc, 4000)
    batches = list(native_pack.pack_sparse_batches_native(
        proc, meta.num_edge_types, True, 4000, caps, 32, 5, False, None))
    assert len(batches) == 1 and int(batches[0].num_nodes) == n

    cfg = {**default_params_for("sparse"), "hidden_size": 32,
           "layer_timesteps": [2], "residual_connections": {},
           "edge_weight_dropout_keep_prob": 1.0}
    model = SparseGGNN(cfg, meta.num_edge_types)
    params = model.init_params(jax.random.PRNGKey(0))
    out = np.asarray(model.forward(params, jax.device_put(batches[0])))
    assert out.shape[0] == batches[0].node_capacity
    assert np.isfinite(out).all()


def test_dfs_reorder_is_pure_relabeling_and_cuts_boundary():
    """dfs_reorder must be an exact relabeling (per-graph model outputs
    unchanged) and must reduce the contiguous-range cut of a giant
    graph (the comm volume of node sharding scales with it)."""
    import jax

    from ggnn_tpu.data.reorder import dfs_reorder
    from ggnn_tpu.data.synthetic import synthetic_giant_graph
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.training.config import default_params_for

    raw = synthetic_giant_graph(400, seed=11)[0]
    re = dfs_reorder(raw)
    # same multiset of typed edges under the relabeling
    assert len(re["graph"]) == len(raw["graph"])
    assert sorted(t for _, t, _ in re["graph"]) == sorted(
        t for _, t, _ in raw["graph"])
    assert sorted(map(tuple, re["node_features"])) == sorted(
        map(tuple, raw["node_features"]))

    def one_batch(g):
        data = [g]
        meta = infer_metadata([data], True)
        proc = preprocess_sparse(data, meta.num_edge_types, True,
                                 [0], {}, False)
        caps = plan_capacities(proc, meta.num_edge_types, 1000)
        return meta, list(pack_sparse_batches(
            proc, meta.num_edge_types, 1000, caps, 32, 5, False, None))[0]

    meta, b_raw = one_batch(raw)
    _, b_re = one_batch(re)
    cfg = {**default_params_for("sparse"), "hidden_size": 32,
           "layer_timesteps": [2], "residual_connections": {},
           "edge_weight_dropout_keep_prob": 1.0}
    model = SparseGGNN(cfg, meta.num_edge_types)
    key = jax.random.PRNGKey(3)
    params = {"graph": model.init_params(key),
              "heads": init_output_heads(key, 32, [0])}
    out_raw = model.readout(params["heads"], [0],
                            model.forward(params["graph"], b_raw), b_raw)
    out_re = model.readout(params["heads"], [0],
                           model.forward(params["graph"], b_re), b_re)
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(out_re),
                               rtol=1e-5, atol=1e-6)

    def cut_edges(batch, n_shards=8):
        nl = -(-batch.node_capacity // n_shards)
        src = np.asarray(batch.edge_sources)
        tgt = np.asarray(batch.edge_targets)
        real = np.asarray(batch.edge_mask) > 0
        return int(np.sum((src[real] // nl) != (tgt[real] // nl)))

    assert cut_edges(b_re) < 0.7 * cut_edges(b_raw), (
        cut_edges(b_re), cut_edges(b_raw))


def test_zero_based_edge_types_rejected_loudly():
    """0-based (or oversized) raw edge types used to negative-index-wrap
    into the LAST type's lanes on the python path (silently wrong
    training data) while the native path raised — both now raise."""
    import pytest

    with pytest.raises(ValueError, match="out of range"):
        graph_to_adjacency_lists([[0, 0, 1]], num_edge_types=2,
                                 tie_fwd_bkwd=True)
    with pytest.raises(ValueError, match="out of range"):
        build_dense_adjacency([[0, 5, 1]], 3, 4, tie_fwd_bkwd=True)


def test_async_flat_packer_matches_legacy_loop():
    """The vectorized async packer (grouped scatters over the
    preprocess-time flat tables) must emit BIT-identical batches to the
    legacy per-(graph, step, type) loop it replaced — eval AND shuffled
    training mode — and the vectorized planner must produce the same
    capacities/plan."""
    import jax
    from ggnn_tpu.data import async_schedule as asn

    data = synthetic_molecules(160, seed=11)
    proc = asn.preprocess_async(data, 4, True, 4, 40, [0], {}, False)
    caps = asn.plan_async_capacities_multi([proc], 4, 500, 4)
    # planner parity (legacy path engaged by stripping the flat tables;
    # nested schedules are materialized first since preprocess_async now
    # stores only the flat form)
    proc_noflat = [dict(g, prop_schedules=asn.get_prop_schedules(g),
                        flat_schedules=None) for g in proc]
    caps_legacy = asn.plan_async_capacities_multi([proc_noflat], 4, 500, 4)
    assert caps == caps_legacy

    def leaves(batches):
        return [np.asarray(leaf) for b in batches
                for leaf in jax.tree_util.tree_leaves(b)]

    fast = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                         16, 5, False))
    slow = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                         16, 5, False, use_flat=False))
    assert len(fast) == len(slow) and len(fast) > 0
    for x, y in zip(fast, slow):
        np.testing.assert_array_equal(x, y)

    r1, r2 = np.random.RandomState(3), np.random.RandomState(3)
    fast = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                         16, 5, True, r1))
    slow = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                         16, 5, True, r2, use_flat=False))
    for x, y in zip(fast, slow):
        np.testing.assert_array_equal(x, y)


def test_async_nested_schedule_roundtrip_and_planner_robustness():
    """(a) nested_schedules_from_flat is an exact inverse of the
    flattening done at preprocess time (preprocess_async stores only the
    flat form); (b) the vectorized planner tolerates an empty split and
    falls back to the legacy path on a heterogeneous corpus instead of
    KeyError-ing (ADVICE round 2)."""
    from ggnn_tpu.data import async_schedule as asn

    data = synthetic_molecules(24, seed=13)
    proc = asn.preprocess_async(data, 4, True, 4, 40, [0], {}, False)
    for g in proc:
        rebuilt = asn.nested_schedules_from_flat(g["flat_schedules"])
        # re-flattening the rebuilt schedules must reproduce the tables
        reflat = asn._flatten_schedules(rebuilt, 40, 4)
        np.testing.assert_array_equal(reflat.counts_st,
                                      g["flat_schedules"].counts_st)
        for a, b in zip(reflat.send, g["flat_schedules"].send):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(reflat.tgt, g["flat_schedules"].tgt):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(reflat.recv_node, g["flat_schedules"].recv_node):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(reflat.initial, g["flat_schedules"].initial):
            np.testing.assert_array_equal(a, b)

    # empty validation split must not crash the flat planner
    caps_empty = asn.plan_async_capacities_multi([proc, []], 4, 500, 4)
    caps_plain = asn.plan_async_capacities_multi([proc], 4, 500, 4)
    assert caps_empty == caps_plain

    # heterogeneous corpus (one graph missing its flat table) must fall
    # back to the legacy planner, producing the same capacities
    broken = [dict(g) for g in proc]
    asn.get_prop_schedules(broken[3])  # materialize nested for fallback
    broken[3]["flat_schedules"] = None
    caps_fallback = asn.plan_async_capacities_multi([broken], 4, 500, 4)
    assert caps_fallback == caps_plain

    # a graph with NEITHER schedule form is unpackable: the legacy
    # fallback must surface a clear error, not an AttributeError
    stripped = dict(proc[2])
    stripped.pop("prop_schedules", None)
    stripped["flat_schedules"] = None
    with pytest.raises(ValueError, match="neither prop_schedules"):
        asn.get_prop_schedules(stripped)
    with pytest.raises(ValueError, match="neither prop_schedules"):
        asn.plan_async_capacities_multi(
            [[dict(g) if g is not proc[2] else stripped for g in proc]],
            4, 500, 4)


def test_dense_adapter_drop_remainder_config_key():
    """CLI users can only reach the adapter through config — the
    `drop_remainder` key must control the reference's silent
    bucket-remainder dropping (the explicit kwarg still wins)."""
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.variants import make_adapter

    data = synthetic_molecules(30, seed=3)
    meta = infer_metadata([data], tie_fwd_bkwd=True)
    cfg = default_params_for("dense")
    cfg["batch_size"] = 256  # reference default >> 30 graphs

    assert make_adapter("dense", cfg, meta).drop_remainder is True
    cfg["drop_remainder"] = False
    adapter = make_adapter("dense", cfg, meta)
    assert adapter.drop_remainder is False
    proc = adapter.preprocess(data, False)
    batches = list(adapter.batches(proc, False))
    assert sum(int(b.num_graphs) for b in batches) == 30
    # Explicit kwarg beats the config key (library/serving callers).
    assert make_adapter("dense", cfg, meta,
                        drop_remainder=True).drop_remainder is True


def test_dense_preprocess_rejects_phantom_vertices():
    """Both dense-family preprocessors must reject an edge that references
    a vertex with no feature row — the FlatCorpus.from_raw contract — with
    a descriptive error, not a silent zero-pad or a bare IndexError."""
    import pytest
    from ggnn_tpu.data.packing import preprocess_gcn_dense

    bad = [{"targets": [[0.1]], "graph": [[0, 1, 3]],  # vertex 3, 2 rows
            "node_features": [[1, 0], [0, 1]]}]
    with pytest.raises(ValueError, match="vertex id 3"):
        preprocess_dense(bad, 2, True, [0], {}, False)
    with pytest.raises(ValueError, match="vertex id 3"):
        preprocess_gcn_dense(bad, [0], {}, False)


def test_async_packer_falls_back_on_heterogeneous_corpus():
    """pack_async_batches must take the legacy loop (not crash mid-epoch)
    when any graph lacks a matching flat table — same contract the
    planner has."""
    from ggnn_tpu.data import async_schedule as asn

    data = synthetic_molecules(20, seed=17)
    proc = asn.preprocess_async(data, 4, True, 4, 40, [0], {}, False)
    broken = [dict(g) for g in proc]
    asn.get_prop_schedules(broken[7])  # materialize nested for fallback
    broken[7]["flat_schedules"] = None
    caps = asn.plan_async_capacities_multi([broken], 4, 500, 4)
    batches = list(asn.pack_async_batches(broken, 4, 500, caps, 4, 40,
                                          16, 5, False))
    want = list(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                       16, 5, False))
    assert len(batches) == len(want)
    for a, b in zip(batches, want):
        np.testing.assert_array_equal(np.asarray(a.node_features),
                                      np.asarray(b.node_features))
        np.testing.assert_array_equal(np.asarray(a.targets),
                                      np.asarray(b.targets))


def test_async_cached_packer_matches_flat():
    """The corpus-cached epoch packer (AsyncPackCache: whole-batch
    gathers/scatters over corpus-concatenated flat tables + static
    scatter ranks) must emit BIT-identical batches to the per-graph
    flat packer — eval AND shuffled training mode, including the
    RandomState consumption (the shuffle draw count depends only on
    corpus length), across multiple epochs."""
    import jax
    from ggnn_tpu.data import async_schedule as asn

    data = synthetic_molecules(160, seed=11)
    proc = asn.preprocess_async(data, 4, True, 4, 40, [0], {}, False)
    caps = asn.plan_async_capacities_multi([proc], 4, 500, 4)
    cache = asn.build_async_pack_cache(proc, 4, 40, 4)
    assert cache is not None and cache.matches(proc, 4, 40, 4)

    def leaves(batches):
        return [np.asarray(leaf) for b in batches
                for leaf in jax.tree_util.tree_leaves(b)]

    fast = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                         16, 5, False, cache=cache))
    ref = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                        16, 5, False))
    assert len(fast) == len(ref) and len(fast) > 0
    for x, y in zip(fast, ref):
        np.testing.assert_array_equal(x, y)

    r1, r2 = np.random.RandomState(3), np.random.RandomState(3)
    for _epoch in range(2):  # shared RandomState must stay in lockstep
        fast = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                             16, 5, True, r1, cache=cache))
        ref = leaves(asn.pack_async_batches(proc, 4, 500, caps, 4, 40,
                                            16, 5, True, r2))
        for x, y in zip(fast, ref):
            np.testing.assert_array_equal(x, y)

    # Oversize graph -> same ValueError the per-graph packers raise.
    import pytest
    tiny_caps = asn.plan_async_capacities_multi([proc[:1]], 4, 500, 4)
    big = max(proc, key=lambda g: len(g["init"]))
    if len(big["init"]) > len(proc[0]["init"]):
        cache_big = asn.build_async_pack_cache([big], 4, 40, 4)
        small_caps = asn.AsyncCapacities(
            nodes=tiny_caps.nodes, graphs=tiny_caps.graphs,
            initial_nodes=1, sending_edges=1, receiving_nodes=1,
            plan=tiny_caps.plan)
        with pytest.raises(ValueError, match="exceeds async capacities"):
            list(asn.pack_async_batches([big], 4, 500, small_caps, 4, 40,
                                        16, 5, False, cache=cache_big))


def test_async_batch_shuffle_mode():
    """async_epoch_shuffle="batches": one-time pack, per-epoch batch-
    ORDER shuffle — composition fixed across epochs, eval stream
    deterministic and identical to the graphs-mode eval stream."""
    import jax
    from ggnn_tpu.data import async_schedule as asn
    from ggnn_tpu.data.loader import DatasetMeta, infer_metadata
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.variants import make_adapter

    data = synthetic_molecules(120, seed=5)
    meta = infer_metadata([data], True)
    cfg = default_params_for("async")
    cfg.update(num_nodes=400, propagation_substeps=40,
               async_epoch_shuffle="batches")
    adapter = make_adapter("async", cfg, meta)
    proc = adapter.preprocess(data, False)
    adapter.plan(proc)

    ref_cfg = dict(cfg, async_epoch_shuffle="graphs")
    ref_adapter = make_adapter("async", ref_cfg, meta)
    ref_adapter.plan(proc)

    # Eval: identical stream to graphs mode (no shuffle anywhere).
    a = list(adapter.batches(proc, False))
    b = list(ref_adapter.batches(proc, False))
    assert len(a) == len(b) > 1
    for x, y in zip(a, b):
        for lx, ly in zip(jax.tree_util.tree_leaves(x),
                          jax.tree_util.tree_leaves(y)):
            np.testing.assert_array_equal(np.asarray(lx), np.asarray(ly))

    # Train: same batch SET in permuted order; second epoch reuses the
    # pack (same objects) under a fresh permutation.
    e1 = list(adapter.batches(proc, True, np.random.RandomState(0)))
    assert {id(x) for x in e1} == {id(x) for x in a}
    e2 = list(adapter.batches(proc, True, np.random.RandomState(1)))
    assert {id(x) for x in e2} == {id(x) for x in a}


def test_async_pack_cache_rejects_foreign_corpus():
    """matches() must reject a same-length corpus with different
    labels, features, or edges (round-4 advisor finding; strengthened
    fingerprint in round 5)."""
    import copy

    from ggnn_tpu.data import async_schedule as asn
    from ggnn_tpu.data.synthetic import synthetic_molecules

    data = synthetic_molecules(12, seed=3)
    proc = asn.preprocess_async(data, 4, True, 4, 40, [0], {}, False)
    cache = asn.build_async_pack_cache(proc, 4, 40, 4)
    assert cache is not None and cache.matches(proc, 4, 40, 4)

    # Different labels, same topology.
    relabeled = [dict(g, labels=[l + 1.0 if l is not None else None
                                 for l in g["labels"]]) for g in proc]
    assert not cache.matches(relabeled, 4, 40, 4)

    # Different features, same counts.
    refeat = [dict(g, init=np.asarray(g["init"]) * 2.0) for g in proc]
    assert not cache.matches(refeat, 4, 40, 4)

    # Different graph schedule (a same-node-count corpus with other
    # edges): regenerate from different molecules.
    other = synthetic_molecules(12, seed=3)
    for g in other:
        g["graph"] = g["graph"][:-1]  # drop one edge per graph
    proc2 = asn.preprocess_async(other, 4, True, 4, 40, [0], {}, False)
    assert not cache.matches(proc2, 4, 40, 4)


def test_async_schedule_depth_overflow_is_value_error():
    """A chain deeper than propagation_substeps raises ValueError with
    the config remedy — user-reachable (serving accepts arbitrary
    graphs), so no bare assert (vanishes under python -O)."""
    import pytest

    from ggnn_tpu.data import async_schedule as asn

    chain = [[i, 1, i + 1] for i in range(20)]  # depth 20 > 15
    with pytest.raises(ValueError, match="propagation_substeps"):
        asn.graph_to_propagation_schedules(chain, 4, True, 2, 15,
                                           num_nodes=21)


def test_pack_async_batches_empty_corpus_yields_nothing():
    """An empty validation split packs to zero batches (the planner
    explicitly supports it; the loop packer used to IndexError)."""
    from ggnn_tpu.data import async_schedule as asn

    caps = asn.AsyncCapacities(nodes=64, graphs=8, initial_nodes=64,
                               sending_edges=64, receiving_nodes=64)
    assert list(asn.pack_async_batches([], 4, 100, caps, 4, 15, 8, 3,
                                       False, None)) == []


def test_negative_vertex_ids_rejected_every_pipeline():
    """A negative vertex id numpy-wraps to the LAST node row (silently
    corrupt adjacency/in-degrees) unless rejected — round-5 review; the
    native path and serving entry already rejected it."""
    import pytest

    bad = [{"targets": [[0.1]], "graph": [[0, 1, -1]],
            "node_features": [[1, 0, 0], [0, 1, 0]]}]
    with pytest.raises(ValueError, match="vertex id out of range"):
        preprocess_sparse(bad, 2, True, [0], {}, False)
    from ggnn_tpu.data.packing import (preprocess_dense, preprocess_gcn,
                                       preprocess_gcn_dense)
    with pytest.raises(ValueError, match="vertex id out of range"):
        preprocess_dense(bad, 2, True, [0], {}, False)
    with pytest.raises(ValueError, match="vertex id out of range"):
        preprocess_gcn(bad, [0], {}, False)
    with pytest.raises(ValueError, match="vertex id out of range"):
        preprocess_gcn_dense(bad, [0], {}, False)


def test_oversized_graph_rejected_at_plan_time():
    """A single graph that can never fit the node budget fails at
    capacity-PLAN time with the batch_size remedy, not mid-epoch with a
    generic pack error (round-5 review)."""
    import pytest

    from ggnn_tpu.data.packing import plan_capacities, plan_gcn_capacities
    from ggnn_tpu.data.synthetic import synthetic_giant_graph

    data = synthetic_giant_graph(50, seed=0)
    proc = preprocess_sparse(data, 4, True, [0], {}, False)
    with pytest.raises(ValueError, match="cannot fit the node budget"):
        plan_capacities(proc, 4, 50)
    plan_capacities(proc, 4, 51)  # strict '<': budget n+1 fits
    from ggnn_tpu.data.packing import preprocess_gcn
    gproc = preprocess_gcn(data, [0], {}, False)
    with pytest.raises(ValueError, match="cannot fit the node budget"):
        plan_gcn_capacities(gproc, 50)


def test_empty_split_packs_to_zero_batches_every_variant():
    """Empty corpora pack to nothing (clear generators, no IndexError /
    StopIteration-in-generator RuntimeError) — round-5 review."""
    from ggnn_tpu.data.packing import (pack_dense_batches, pack_gcn_batches,
                                       preprocess_dense, preprocess_gcn,
                                       preprocess_gcn_dense)

    assert list(pack_sparse_batches(
        [], 2, 100, PackCapacities(nodes=8, edges_per_type=8, graphs=8),
        8, 3, False)) == []
    assert list(pack_gcn_batches(
        [], 100, PackCapacities(nodes=8, edges_per_type=8, graphs=8),
        8, 3, False)) == []
    bucketed, sizes = preprocess_dense([], 2, True, [0], {}, False)
    assert bucketed == {}
    assert list(pack_dense_batches(bucketed, sizes, 4, 8, 3, False)) == []
    bucketed2, _ = preprocess_gcn_dense([], [0], {}, False)
    assert bucketed2 == {}
    assert preprocess_gcn([], [0], {}, False) == []
