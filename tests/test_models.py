"""Model-level tests: cross-variant agreement, ablations, async invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from ggnn_tpu.data import (
    PackCapacities, preprocess_sparse, pack_sparse_batches,
    preprocess_dense, pack_dense_batches,
)
from ggnn_tpu.data.packing import preprocess_gcn, plan_gcn_capacities, pack_gcn_batches
from ggnn_tpu.data.async_schedule import (
    AsyncCapacities, check_schedule_invariants, graph_to_propagation_schedules,
    pack_async_batches, plan_async_capacities, preprocess_async,
)
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.dense_ggnn import DenseGGNN
from ggnn_tpu.models.gcn import GCN
from ggnn_tpu.models.sparse_ggnn import SparseGGNN
from ggnn_tpu.models.async_ggnn import AsyncGGNN
from ggnn_tpu.training.config import (
    ASYNC_DEFAULTS, DENSE_DEFAULTS, GCN_DEFAULTS, SPARSE_DEFAULTS)


TEST_GRAPHS = [
    {"targets": [[0.3]], "graph": [[0, 1, 1], [1, 2, 2], [0, 1, 3]],
     "node_features": [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]]},
    {"targets": [[-0.7]], "graph": [[0, 1, 1], [1, 1, 2]],
     "node_features": [[0, 1, 0], [0, 0, 1], [1, 0, 0]]},
]
NUM_EDGE_TYPES = 2
H = 8


def _sparse_batch(hidden=H):
    processed = preprocess_sparse(TEST_GRAPHS, NUM_EDGE_TYPES, True, [0], {},
                                  False)
    caps = PackCapacities(nodes=8, edges_per_type=16, graphs=8)
    return next(pack_sparse_batches(processed, NUM_EDGE_TYPES, 100, caps,
                                    hidden, 3, False))


def test_dense_and_sparse_ggnn_agree():
    """Configured identically, the two GGNN paths must compute allclose
    per-node states — the SURVEY §4 cross-variant oracle."""
    config_s = {**SPARSE_DEFAULTS, "hidden_size": H,
                "layer_timesteps": [4], "residual_connections": {},
                "use_edge_msg_avg_aggregation": False, "use_edge_bias": True,
                "edge_weight_dropout_keep_prob": 1.0}
    config_d = {**DENSE_DEFAULTS, "hidden_size": H, "num_timesteps": 4,
                "use_edge_bias": True}

    sparse_model = SparseGGNN(config_s, NUM_EDGE_TYPES)
    dense_model = DenseGGNN(config_d, NUM_EDGE_TYPES)
    key = jax.random.PRNGKey(0)
    sp = sparse_model.init_params(key)
    dp = dense_model.init_params(key)
    # Share identical weights across the two parameterizations.
    dp["edge_weights"] = sp["layers"][0]["edge_weights"]
    dp["edge_biases"] = jnp.array(
        np.random.RandomState(0).randn(NUM_EDGE_TYPES, 1, H), jnp.float32)
    sp["layers"][0]["edge_biases"] = dp["edge_biases"][:, 0, :]
    dp["cell"] = sp["layers"][0]["cell"]

    sbatch = jax.device_put(_sparse_batch())
    s_out = np.asarray(sparse_model.forward(sp, sbatch))

    bucketed, bucket_sizes = preprocess_dense(TEST_GRAPHS, NUM_EDGE_TYPES,
                                              True, [0], {}, False)
    dbatches = list(pack_dense_batches(bucketed, bucket_sizes, 2, H, 3,
                                       False, drop_remainder=False))
    assert len(dbatches) == 1
    d_out = np.asarray(dense_model.forward(dp, jax.device_put(dbatches[0])))

    # Map packed node rows back to (graph, vertex) and compare.
    v = d_out.shape[1]
    np.testing.assert_allclose(s_out[0:4], d_out[0, :4], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_out[4:7], d_out[1, :3], rtol=1e-4, atol=1e-5)


def test_sparse_residual_and_attention_paths_run():
    config = {**SPARSE_DEFAULTS, "hidden_size": H,
              "layer_timesteps": [2, 2, 1, 2, 1],
              "use_propagation_attention": True,
              "edge_weight_dropout_keep_prob": 1.0}
    model = SparseGGNN(config, NUM_EDGE_TYPES)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = jax.device_put(_sparse_batch())
    out = model.forward(params, batch)
    assert out.shape == (8, H)
    assert np.isfinite(np.asarray(out)).all()
    # layer 2 consumes a residual from layer 0 -> wider cell input
    assert params["layers"][2]["cell"]["gates_kernel"].shape[0] == 3 * H
    assert params["layers"][0]["cell"]["gates_kernel"].shape[0] == 2 * H


def test_rgcn_config_runs():
    from ggnn_tpu.training.config import default_params_for
    config = {**default_params_for("rgcn"), "hidden_size": H}
    model = SparseGGNN(config, NUM_EDGE_TYPES)
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.forward(params, jax.device_put(_sparse_batch()))
    assert len(params["layers"]) == 8
    # RNN cell params, not GRU
    assert "kernel" in params["layers"][0]["cell"]
    assert np.isfinite(np.asarray(out)).all()


def test_gcn_forward_matches_numpy():
    config = {**GCN_DEFAULTS, "hidden_size": H, "num_timesteps": 2}
    model = GCN(config)
    params = model.init_params(jax.random.PRNGKey(0))
    processed = preprocess_gcn(TEST_GRAPHS, [0], {}, False)
    caps = plan_gcn_capacities(processed, 100)
    batch = next(pack_gcn_batches(processed, 100, caps, H, 3, False))
    out = np.asarray(model.forward(params, jax.device_put(batch)))

    # NumPy oracle: dense normalized adjacency per graph, two layers.
    n = int(batch.num_nodes)
    a_hat = np.zeros((caps.nodes, caps.nodes))
    k = int(batch.edge_weights.astype(bool).sum())
    for s, t, w in zip(batch.edge_sources[:k], batch.edge_targets[:k],
                       batch.edge_weights[:k]):
        a_hat[t, s] = w
    h = np.asarray(batch.node_features)
    h = np.maximum(a_hat @ h @ np.asarray(params["layers"][0]["W"]), 0)
    h = a_hat @ h @ np.asarray(params["layers"][1]["W"])
    np.testing.assert_allclose(out[:n], h[:n], rtol=1e-4, atol=1e-5)


def test_blocked_gcn_matches_edge_list_gcn():
    """The `gcn_blocked` dense-path variant must compute the SAME math
    as the edge-list GCN (both implement chem_tensorflow_gcn.py:42-93
    over the shared D^{-1/2}(A+I)D^{-1/2} normalization): identical
    params -> allclose per-graph outputs, in both bias modes and across
    multiple buckets."""
    from ggnn_tpu.data.packing import preprocess_gcn_dense
    from ggnn_tpu.models.gcn import BlockedGCN
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.training.config import default_params_for

    data = synthetic_molecules(24, seed=3)
    from ggnn_tpu.data.loader import infer_metadata
    meta = infer_metadata([data], True)
    for bias in (False, True):
        cfg_s = default_params_for("gcn")
        cfg_b = default_params_for("gcn_blocked")
        cfg_s["gcn_use_bias"] = cfg_b["gcn_use_bias"] = bias
        gcn, blk = GCN(cfg_s), BlockedGCN(cfg_b)
        params = gcn.init_params(jax.random.PRNGKey(0))  # shared tree
        heads = init_output_heads(jax.random.PRNGKey(1),
                                  cfg_s["hidden_size"], [0])

        proc = preprocess_gcn(data, [0], {}, False)
        caps = plan_gcn_capacities(proc, cfg_s["batch_size"])
        (batch,) = list(pack_gcn_batches(
            proc, cfg_s["batch_size"], caps, cfg_s["hidden_size"],
            meta.annotation_size, False))
        h = gcn.forward(params, batch)
        out_s = np.asarray(gcn.readout(heads, [0], h, batch)
                           )[:, :int(batch.num_graphs)]

        bucketed, sizes = preprocess_gcn_dense(
            data, [0], {}, False,
            bucket_sizes=np.asarray(cfg_b["dense_bucket_sizes"]))
        assert len(bucketed) > 1  # exercise >1 compiled bucket shape
        order = [g["graph_id"] for b in bucketed.values() for g in b]
        outs = []
        for db in pack_dense_batches(bucketed, sizes, cfg_b["batch_size"],
                                     cfg_b["hidden_size"],
                                     meta.annotation_size, False,
                                     drop_remainder=False):
            hb = blk.forward(params, db)
            outs.append(np.asarray(blk.readout(heads, [0], hb, db)
                                   )[:, :int(db.num_graphs)])
        packed = np.concatenate(outs, axis=1)
        out_b = np.empty_like(packed)
        out_b[:, np.asarray(order)] = packed
        np.testing.assert_allclose(out_s, out_b, rtol=1e-5, atol=1e-6)


def test_async_schedule_invariants_and_coverage():
    for g in synthetic_molecules(20, seed=3):
        schedules = graph_to_propagation_schedules(g["graph"], 4, True, 4, 40)
        n = len(g["node_features"])
        for sched in schedules:
            check_schedule_invariants(sched, 4)
            initial, _s, _m, receiving = sched
            covered = set(map(int, initial))
            for r in receiving:
                covered.update(map(int, r))
            assert covered == set(range(n))


def test_async_forward_runs_and_is_finite():
    config = {**ASYNC_DEFAULTS, "hidden_size": H, "propagation_substeps": 40}
    raw = synthetic_molecules(10, seed=4)
    processed = preprocess_async(raw, 4, True, 4, 40, [0], {}, False)
    caps = plan_async_capacities(processed, 4, 200, 4)
    batches = list(pack_async_batches(processed, 4, 200, caps, 4, 40, H, 5,
                                      False))
    model = AsyncGGNN(config, 4)
    params = model.init_params(jax.random.PRNGKey(0))
    for batch in batches:
        out = np.asarray(model.forward(params, jax.device_put(batch)))
        assert np.isfinite(out).all()
        # every real node was written at least once across the last round
        n = int(batch.num_nodes)
        assert not np.allclose(out[:n], 0.0)


def test_async_single_round_path_graph_oracle():
    """On a path 0-1-2 (tied), round 0 fwd from the min-degree seed: node
    depths via DFS; receivers get GRU(prev_state, summed messages from
    already-updated senders). Check against a step-by-step NumPy replay."""
    graph = [{"targets": [[0.0]], "graph": [[0, 1, 1], [1, 1, 2]],
              "node_features": [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]}]
    config = {**ASYNC_DEFAULTS, "hidden_size": 2, "propagation_rounds": 2,
              "propagation_substeps": 5}
    processed = preprocess_async(graph, 1, True, 2, 5, [0], {}, False)
    caps = plan_async_capacities(processed, 1, 100, 2)
    batch = next(pack_async_batches(processed, 1, 100, caps, 2, 5, 2, 2,
                                    False))
    model = AsyncGGNN(config, 1)
    params = model.init_params(jax.random.PRNGKey(0))
    out = np.asarray(model.forward(params, jax.device_put(batch)))

    # NumPy replay of the schedule semantics.
    from tests.test_cells import np_gru
    w = np.asarray(params["edge_weights"][0])
    cell = {k: np.asarray(v) for k, v in params["cell"].items()}
    cur = np.array(graph[0]["node_features"], dtype=np.float32)
    for r in range(2):
        from ggnn_tpu.data.async_schedule import get_prop_schedules
        initial, sending, msg_targets, receiving = (
            get_prop_schedules(processed[0])[r])
        new = np.zeros_like(cur)
        for v in initial:
            new[v] = cur[v]
        for s in range(len(receiving)):
            recv = receiving[s]
            agg = np.zeros((len(recv), 2), dtype=np.float32)
            for v, t_local in zip(sending[s][0], msg_targets[s][0]):
                agg[t_local] += new[v] @ w
            upd = np_gru(cell, agg, cur[recv])
            new[recv] = upd
        cur = new
    np.testing.assert_allclose(out[:3], cur, rtol=1e-4, atol=1e-5)


def test_aggregate_first_matches_transform_first():
    """Aggregate-before-transform is a pure linearity rewrite: both paths
    must agree to f32 reduction tolerance, with attention and edge bias
    on (ops/messages.py:aggregate_then_transform)."""
    base = {**SPARSE_DEFAULTS, "hidden_size": H,
            "layer_timesteps": [2, 2], "residual_connections": {"1": [0]},
            "use_propagation_attention": True, "use_edge_bias": True,
            "edge_weight_dropout_keep_prob": 1.0}
    m_fast = SparseGGNN({**base, "aggregate_first": True}, NUM_EDGE_TYPES)
    m_ref = SparseGGNN({**base, "aggregate_first": False}, NUM_EDGE_TYPES)
    params = m_fast.init_params(jax.random.PRNGKey(1))
    batch = jax.device_put(_sparse_batch())
    out_fast = np.asarray(m_fast.forward(params, batch))
    out_ref = np.asarray(m_ref.forward(params, batch))
    np.testing.assert_allclose(out_fast, out_ref, rtol=1e-5, atol=1e-6)


def test_bfloat16_compute_dtype_runs_close_to_f32():
    base = {**SPARSE_DEFAULTS, "hidden_size": H,
            "edge_weight_dropout_keep_prob": 1.0}
    m32 = SparseGGNN(base, NUM_EDGE_TYPES)
    m16 = SparseGGNN({**base, "compute_dtype": "bfloat16"}, NUM_EDGE_TYPES)
    params = m32.init_params(jax.random.PRNGKey(2))
    batch = jax.device_put(_sparse_batch())
    out32 = np.asarray(m32.forward(params, batch))
    out16 = np.asarray(m16.forward(params, batch))
    assert out16.dtype == np.float32  # states return in f32
    assert np.isfinite(out16).all()
    # bf16 has ~8 mantissa bits; states are tanh-bounded.
    np.testing.assert_allclose(out16, out32, atol=0.05)


def test_extended_dense_matches_sparse_full_features():
    """The TPU-first extended dense path (block-diagonal formulation)
    must reproduce the sparse model exactly under the FULL feature set:
    5 layers, residual connections, propagation attention, edge bias,
    in-degree averaging. Same params pytree drives both models."""
    config = {**SPARSE_DEFAULTS, "hidden_size": H,
              "layer_timesteps": [2, 2, 1, 2, 1],
              "residual_connections": {"2": [0], "4": [0, 2]},
              "use_propagation_attention": True,
              "use_edge_bias": True,
              "use_edge_msg_avg_aggregation": True,
              "edge_weight_dropout_keep_prob": 1.0}
    sparse_model = SparseGGNN(config, NUM_EDGE_TYPES)
    dense_model = DenseGGNN(config, NUM_EDGE_TYPES)
    params = sparse_model.init_params(jax.random.PRNGKey(3))

    sbatch = jax.device_put(_sparse_batch())
    s_out = np.asarray(sparse_model.forward(params, sbatch))

    bucketed, bucket_sizes = preprocess_dense(TEST_GRAPHS, NUM_EDGE_TYPES,
                                              True, [0], {}, False)
    dbatch = next(pack_dense_batches(bucketed, bucket_sizes, 2, H, 3,
                                     False, drop_remainder=False))
    d_out = np.asarray(dense_model.forward(params, jax.device_put(dbatch)))

    np.testing.assert_allclose(s_out[0:4], d_out[0, :4], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(s_out[4:7], d_out[1, :3], rtol=1e-4,
                               atol=1e-5)


def test_extended_dense_gradients_finite():
    config = {**SPARSE_DEFAULTS, "hidden_size": H,
              "layer_timesteps": [2, 1],
              "residual_connections": {"1": [0]},
              "use_propagation_attention": True,
              "use_edge_bias": True,
              "edge_weight_dropout_keep_prob": 1.0}
    model = DenseGGNN(config, NUM_EDGE_TYPES)
    params = model.init_params(jax.random.PRNGKey(0))
    bucketed, bucket_sizes = preprocess_dense(TEST_GRAPHS, NUM_EDGE_TYPES,
                                              True, [0], {}, False)
    dbatch = next(pack_dense_batches(bucketed, bucket_sizes, 2, H, 3,
                                     False, drop_remainder=False))

    def loss(p):
        return jnp.sum(model.forward(p, dbatch) ** 2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_async_compact_matches_plain_path():
    """The compact-buffer fast path (contiguous slice writes per
    substep) must be numerically identical to the plain scatter path on
    every round/step — same schedules, same weights."""
    H = 16
    raw = synthetic_molecules(25, seed=9)
    processed = preprocess_async(raw, 4, True, 4, 40, [0], {}, False)
    caps = plan_async_capacities(processed, 4, 220, 4)
    batches = list(pack_async_batches(processed, 4, 220, caps, 4, 40, H, 5,
                                      False, None))
    cfg = {"hidden_size": H, "propagation_rounds": 4,
           "propagation_substeps": 40, "use_edge_bias": True,
           "graph_rnn_cell": "GRU", "graph_rnn_activation": "tanh",
           "graph_state_dropout_keep_prob": 1.0}
    model_fast = AsyncGGNN(dict(cfg, async_compact=True), 4)
    model_plain = AsyncGGNN(dict(cfg, async_compact=False), 4)
    params = model_fast.init_params(jax.random.PRNGKey(3))
    for b in batches:
        fast = np.asarray(model_fast.forward(params, b))
        plain = np.asarray(model_plain.forward(params, b))
        np.testing.assert_allclose(fast, plain, rtol=1e-5, atol=1e-6)
    # Gradients agree too (the slice-write overwrite scheme must not
    # leak cotangents through overwritten pad rows).
    b = batches[0]

    def loss(p, m):
        return jnp.sum(m.forward(p, b) ** 2)

    g_fast = jax.grad(lambda p: loss(p, model_fast))(params)
    g_plain = jax.grad(lambda p: loss(p, model_plain))(params)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6),
        g_fast, g_plain)


def test_async_isolated_nodes_keep_their_features():
    """Feature rows with no incident edges are valid input (same shape
    class as the dense-bucketing OOB fix). They must ride through every
    round as initial nodes on BOTH async paths — the compact layout used
    to map them to the dump slot (state 0) while the plain path kept
    their features."""
    H = 12
    raw = [
        # node 2 isolated
        {"targets": [[0.5]], "graph": [[0, 1, 1]],
         "node_features": [[1, 0, 0], [0, 1, 0], [0, 0, 1]]},
        # nodes 0-1 bonded; node 3 isolated, distinctive feature
        {"targets": [[-0.25]], "graph": [[0, 2, 1], [1, 1, 2]],
         "node_features": [[1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1]]},
    ]
    processed = preprocess_async(raw, 2, True, 2, 10, [0], {}, False)
    caps = plan_async_capacities(processed, 2, 64, 2)
    batch = next(pack_async_batches(processed, 2, 64, caps, 2, 10, H, 3,
                                    False, None))
    assert batch.seg_rounds is not None
    cfg = {"hidden_size": H, "propagation_rounds": 2,
           "propagation_substeps": 10, "use_edge_bias": False,
           "graph_rnn_cell": "GRU", "graph_rnn_activation": "tanh",
           "graph_state_dropout_keep_prob": 1.0}
    model_fast = AsyncGGNN(dict(cfg, async_compact=True), 2)
    model_plain = AsyncGGNN(dict(cfg, async_compact=False), 2)
    params = model_fast.init_params(jax.random.PRNGKey(1))
    fast = np.asarray(model_fast.forward(params, batch))
    plain = np.asarray(model_plain.forward(params, batch))
    np.testing.assert_allclose(fast, plain, rtol=1e-5, atol=1e-6)
    # Isolated global rows: 2 (graph 0) and 3+3=6 (graph 1 offset 3).
    feats = np.asarray(batch.node_features)
    for row in (2, 6):
        np.testing.assert_allclose(fast[row], feats[row], rtol=1e-6,
                                   err_msg=f"isolated node row {row}")
        assert np.abs(fast[row]).sum() > 0


def test_async_edgeless_graph_passes_features_through():
    """A graph with no edges at all (single-atom molecule shape) used to
    ZeroDivisionError in the schedule compiler (empty seed list). Every
    round must be step-free with all nodes initial, on both paths."""
    H = 8
    raw = [
        {"targets": [[0.1]], "graph": [],
         "node_features": [[1, 0, 0], [0, 1, 0]]},
        {"targets": [[0.2]], "graph": [[0, 1, 1]],
         "node_features": [[1, 0, 0], [0, 0, 1]]},
    ]
    processed = preprocess_async(raw, 2, True, 4, 10, [0], {}, False)
    from ggnn_tpu.data.async_schedule import get_prop_schedules
    for g in processed:
        for sch in get_prop_schedules(g):
            check_schedule_invariants(sch, 2)
    caps = plan_async_capacities(processed, 2, 64, 4)
    batch = next(pack_async_batches(processed, 2, 64, caps, 4, 10, H, 3,
                                    False, None))
    cfg = {"hidden_size": H, "propagation_rounds": 4,
           "propagation_substeps": 10, "use_edge_bias": False,
           "graph_rnn_cell": "GRU", "graph_rnn_activation": "tanh",
           "graph_state_dropout_keep_prob": 1.0}
    feats = np.asarray(batch.node_features)
    for compact in (True, False):
        model = AsyncGGNN(dict(cfg, async_compact=compact), 2)
        params = model.init_params(jax.random.PRNGKey(0))
        out = np.asarray(model.forward(params, batch))
        np.testing.assert_allclose(out[:2], feats[:2], rtol=1e-6,
                                   err_msg=f"compact={compact}")


def test_combined_lane_matches_typed_lanes():
    """The type-combined edge lane is a pure re-layout: forward and
    gradients match the per-type-lane path (attention on and off)."""
    from ggnn_tpu.data import packing
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.training.config import default_params_for

    data = synthetic_molecules(40, seed=13)
    meta = infer_metadata([data], True)
    for attention in (False, True):
        cfg = default_params_for("sparse")
        cfg.update({"hidden_size": 16, "batch_size": 300,
                    "use_propagation_attention": attention,
                    "use_edge_bias": True})
        proc = packing.preprocess_sparse(data, meta.num_edge_types, True,
                                         [0], {}, False)
        caps = packing.plan_capacities(proc, meta.num_edge_types, 300)
        assert caps.edges_all > 0
        batches = list(packing.pack_sparse_batches(
            proc, meta.num_edge_types, 300, caps, 16,
            meta.annotation_size, False, None))
        assert batches[0].edge_sources_all is not None
        m_comb = SparseGGNN(dict(cfg, combined_edge_lanes=True),
                            meta.num_edge_types)
        m_typed = SparseGGNN(dict(cfg, combined_edge_lanes=False),
                             meta.num_edge_types)
        params = m_comb.init_params(jax.random.PRNGKey(5))
        for b in batches:
            a = np.asarray(m_comb.forward(params, b))
            c = np.asarray(m_typed.forward(params, b))
            np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
        b = batches[0]
        g_a = jax.grad(lambda p: jnp.sum(m_comb.forward(p, b) ** 2))(params)
        g_c = jax.grad(lambda p: jnp.sum(m_typed.forward(p, b) ** 2))(params)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6),
            g_a, g_c)


def test_async_out_of_plan_schedule_falls_back_to_plain_path():
    """Caps planned on SHALLOW graphs must not silently zero out a
    DEEPER graph's states: the segment builder raises on schedule steps
    outside the planned segments, the batch falls back to the plain
    path (seg_rounds=None), and the forward matches caps planned on the
    deep graph itself. (Regression: the fast path used to drop
    out-of-plan steps, returning zeros for arbitrary predict inputs.)"""
    H = 8

    def chain(n):
        return {"targets": [[0.1]],
                "graph": [[i, 1, i + 1] for i in range(n - 1)],
                "node_features": [[1, 0] for _ in range(n)]}

    shallow = [chain(3) for _ in range(4)]
    deep = [chain(9)]
    proc_shallow = preprocess_async(shallow, 1, True, 2, 12, [0], {}, False)
    caps = plan_async_capacities(proc_shallow, 1, 100, 2)
    proc_deep = preprocess_async(deep, 1, True, 2, 12, [0], {}, False)
    batch = next(pack_async_batches(proc_deep, 1, 100, caps, 2, 12, H, 2,
                                    False, None))
    assert batch.seg_rounds is None  # plain-path fallback engaged

    caps_deep = plan_async_capacities(proc_deep, 1, 100, 2)
    batch_ok = next(pack_async_batches(proc_deep, 1, 100, caps_deep, 2, 12,
                                       H, 2, False, None))
    cfg = {"hidden_size": H, "propagation_rounds": 2,
           "propagation_substeps": 12, "use_edge_bias": False,
           "graph_rnn_cell": "GRU", "graph_rnn_activation": "tanh",
           "graph_state_dropout_keep_prob": 1.0}
    model = AsyncGGNN(cfg, 1)
    params = model.init_params(jax.random.PRNGKey(0))
    got = np.asarray(model.forward(params, batch))[:9]
    want = np.asarray(model.forward(params, batch_ok))[:9]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert not np.allclose(want, 0.0)


def test_async_self_loop_drop_matches_reference_quirk():
    """Self-loop edges are excluded from the async schedule — matching
    the reference (async.py:330 asserts v == w for equal-depth edges
    and schedules neither direction). Pinned so the deliberate
    divergence from the sparse variant stays documented behavior."""
    sched = graph_to_propagation_schedules(
        [[0, 1, 1], [0, 1, 0]], 1, True, 2, 5)
    total_sends = 0
    for (initial, sending, _m, _r) in sched:
        for step in sending:
            for t_arr in step:
                total_sends += len(t_arr)
    # 1 real edge x fwd+bwd over 1 round pair; the self-loop adds none.
    assert total_sends == 2


def test_async_rejects_out_of_range_edge_types():
    import pytest

    with pytest.raises(ValueError, match="out of range"):
        preprocess_async([{"targets": [[0.0]],
                           "graph": [[0, 7, 1]],
                           "node_features": [[1, 0], [0, 1]]}],
                         4, True, 2, 5, [0], {}, False)


def test_lane_pad_rejects_string_modes():
    """bool("false") is True — a JSON typo like "lane_pad": "off" must
    raise, not silently ENABLE padding."""
    import pytest

    from ggnn_tpu.ops.lanes import resolve_lane_pad
    assert resolve_lane_pad({"lane_pad": "auto"}, 100) is True
    assert resolve_lane_pad({"lane_pad": "auto"}, 128) is False
    assert resolve_lane_pad({"lane_pad": False}, 100) is False
    for bad in ("false", "off", "none", 0.5):
        with pytest.raises(ValueError, match="lane_pad"):
            resolve_lane_pad({"lane_pad": bad}, 100)


def test_lane_padding_matches_unpadded():
    """The 128-lane compute padding (ops/lanes.py) is numerics-
    preserving: forward states and parameter gradients match the
    unpadded layout to f32 tiling tolerance on the reference dense
    path, the extended path (residuals + attention + bias + avg, every
    cell family), and the blocked GCN — with the edge-weight-dropout
    RNG stream unchanged (masks drawn at the unpadded shape)."""
    from ggnn_tpu.models.gcn import BlockedGCN
    from ggnn_tpu.graph import DenseGraphBatch

    rng = np.random.RandomState(0)
    B, T, V, hidden = 2, NUM_EDGE_TYPES, 8, 100
    adj = (rng.rand(B, T, V, V) < 0.2).astype(np.float32)
    feats = (rng.randn(B, V, hidden) * 0.3).astype(np.float32)
    batch = DenseGraphBatch(
        node_features=jnp.asarray(feats), adjacency=jnp.asarray(adj),
        node_mask=jnp.ones((B, V)), targets=jnp.zeros((1, B)),
        target_mask=jnp.ones((1, B)), num_graphs=B)

    cfg = {**DENSE_DEFAULTS, "hidden_size": hidden, "use_edge_bias": True,
           "edge_weight_dropout_keep_prob": 0.8}
    m_pad = DenseGGNN({**cfg, "lane_pad": True}, T)
    m_ref = DenseGGNN({**cfg, "lane_pad": False}, T)
    assert m_pad.lane_pad and not m_ref.lane_pad
    params = m_pad.init_params(jax.random.PRNGKey(1))
    a = np.asarray(m_pad.forward(params, batch))
    b = np.asarray(m_ref.forward(params, batch))
    assert a.shape == (B, V, hidden)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # Training path: the dropout mask is drawn at the UNPADDED weight
    # shape, so padded and unpadded draws are stream-identical.
    k = jax.random.PRNGKey(7)
    a2 = np.asarray(m_pad.forward(params, batch, rng=k, is_training=True))
    b2 = np.asarray(m_ref.forward(params, batch, rng=k, is_training=True))
    np.testing.assert_allclose(a2, b2, rtol=1e-5, atol=1e-6)

    def loss(p, model):
        return jnp.sum(model.forward(p, batch) ** 2)

    gp = jax.grad(lambda p: loss(p, m_pad))(params)
    gr = jax.grad(lambda p: loss(p, m_ref))(params)
    for x, y in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)

    for cell in ["GRU", "CudnnCompatibleGRUCell", "RNN"]:
        ecfg = {**SPARSE_DEFAULTS, "hidden_size": hidden,
                "layer_timesteps": [2, 1], "residual_connections": {"1": [0]},
                "use_propagation_attention": True, "use_edge_bias": True,
                "use_edge_msg_avg_aggregation": True,
                "edge_weight_dropout_keep_prob": 1.0,
                "graph_rnn_cell": cell, "graph_rnn_activation": "tanh"}
        me_pad = DenseGGNN({**ecfg, "lane_pad": True}, T)
        me_ref = DenseGGNN({**ecfg, "lane_pad": False}, T)
        pe = me_pad.init_params(jax.random.PRNGKey(2))
        ae = np.asarray(me_pad.forward(pe, batch))
        be = np.asarray(me_ref.forward(pe, batch))
        np.testing.assert_allclose(ae, be, rtol=1e-5, atol=1e-6)

    gcfg = {**GCN_DEFAULTS, "hidden_size": hidden, "gcn_use_bias": True}
    gbatch = DenseGraphBatch(
        node_features=jnp.asarray(feats), adjacency=jnp.asarray(adj[:, :1]),
        node_mask=jnp.ones((B, V)), targets=jnp.zeros((1, B)),
        target_mask=jnp.ones((1, B)), num_graphs=B)
    gm_pad = BlockedGCN({**gcfg, "lane_pad": True})
    gm_ref = BlockedGCN({**gcfg, "lane_pad": False})
    gparams = gm_pad.init_params(jax.random.PRNGKey(3))
    ga = np.asarray(gm_pad.forward(gparams, gbatch))
    gb = np.asarray(gm_ref.forward(gparams, gbatch))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-6)


def test_residual_connections_validated_at_construction():
    """An out-of-range residual source raises a clear ValueError at
    model construction, not a bare IndexError deep inside forward
    (round-5 chaos-sweep finding). Layer keys beyond the layer count
    stay ignored — reference parity (the default config carries
    {"2":[0],"4":[0,2]} and shorter layer_timesteps must still work)."""
    import pytest

    bad = {**SPARSE_DEFAULTS, "hidden_size": 8,
           "layer_timesteps": [1, 1],
           "residual_connections": {"1": [0, 5]}}
    with pytest.raises(ValueError, match="residual_connections"):
        SparseGGNN(bad, NUM_EDGE_TYPES)
    with pytest.raises(ValueError, match="residual_connections"):
        DenseGGNN({**bad, "use_edge_bias": True,
                   "graph_state_dropout_keep_prob": 1.0,
                   "edge_weight_dropout_keep_prob": 1.0},
                  NUM_EDGE_TYPES)
    # Reference default keys beyond a short layer count: accepted.
    ok = {**SPARSE_DEFAULTS, "hidden_size": 8,
          "layer_timesteps": [1, 1]}  # defaults keep {"2":..., "4":...}
    SparseGGNN(ok, NUM_EDGE_TYPES)
