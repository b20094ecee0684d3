"""Multi-chip (data, edge) mesh tests on the virtual 8-device CPU mesh.

The oracle is the single-device model run over the same batches with
global-batch loss semantics: sharding over the mesh must be a pure
re-layout, so losses, accuracies and one-step-updated parameters must
agree to float32 tolerance across mesh shapes (SURVEY.md §4's
multi-host-on-one-host strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.data import packing
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads
from ggnn_tpu.models.sparse_ggnn import SparseGGNN
from ggnn_tpu.parallel import (
    empty_batch_like,
    make_mesh,
    make_parallel_steps,
    repad_edges,
    stack_batches,
)
from ggnn_tpu.parallel.node_shard import (
    plan_node_shard_caps,
    shard_and_stack,
    shard_batch,
)


def _stack_for(batches, n_data, n_edge, exchange="alltoall"):
    """Node-sharded stacking when the edge axis is active, plain
    data-parallel stacking otherwise (the production Runner path)."""
    if n_edge > 1:
        caps = plan_node_shard_caps(batches, n_edge)
        return shard_and_stack(batches, caps, n_data, exchange=exchange)
    return stack_batches(batches, n_data=n_data, n_edge=n_edge)
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer
from ggnn_tpu.utils.constants import SMALL_NUMBER


def _setup(attention=True, edge_bias=True, n_mols=48, batch_nodes=160):
    cfg = default_params_for("sparse")
    cfg.update({
        "batch_size": batch_nodes,
        "use_propagation_attention": attention,
        "use_edge_bias": edge_bias,
        # Deterministic: dropout off so parallel and oracle rng paths
        # cannot diverge.
        "edge_weight_dropout_keep_prob": 1.0,
        "graph_state_dropout_keep_prob": 1.0,
    })
    data = synthetic_molecules(n_mols, seed=3)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    proc = packing.preprocess_sparse(
        data, meta.num_edge_types, cfg["tie_fwd_bkwd"], cfg["task_ids"],
        cfg["task_sample_ratios"], False)
    caps = packing.plan_capacities(proc, meta.num_edge_types,
                                   cfg["batch_size"])
    batches = list(packing.pack_sparse_batches(
        proc, meta.num_edge_types, cfg["batch_size"], caps,
        cfg["hidden_size"], meta.annotation_size, False, None))
    assert len(batches) >= 2
    return cfg, meta, batches


def _params(cfg, meta, edge_axis=None):
    model = SparseGGNN(cfg, meta.num_edge_types, edge_axis=edge_axis)
    key = jax.random.PRNGKey(7)
    params = {
        "graph": model.init_params(key),
        "heads": init_output_heads(key, cfg["hidden_size"], cfg["task_ids"]),
    }
    return model, params


def _oracle_loss(model, params, batches, task_ids):
    """Global-batch loss: per-task sums over every batch, normalised once."""
    abs_s = sq_s = mask_s = 0.0
    for b in batches:
        final = model.forward(params["graph"], b)
        computed = model.readout(params["heads"], task_ids, final, b)
        diff = (computed - b.targets) * b.target_mask
        abs_s = abs_s + jnp.sum(jnp.abs(diff), axis=1)
        sq_s = sq_s + jnp.sum(0.5 * jnp.square(diff), axis=1)
        mask_s = mask_s + jnp.sum(b.target_mask, axis=1)
    target_num = mask_s + SMALL_NUMBER
    return jnp.sum(sq_s / target_num), abs_s / target_num


@pytest.mark.parametrize("n_data,n_edge", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_parallel_loss_matches_single_device(n_data, n_edge):
    cfg, meta, batches = _setup()
    mesh = make_mesh(n_data=n_data, n_edge=n_edge)
    model_p, params = _params(cfg, meta,
                              edge_axis="edge" if n_edge > 1 else None)
    model_s, _ = _params(cfg, meta)
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": opt.init(params)}
    _, eval_step = make_parallel_steps(model_p, opt, cfg, cfg["task_ids"],
                                       mesh)
    stack = _stack_for(batches, n_data, n_edge)
    _, metrics = eval_step(state, stack, None)

    exp_loss, exp_acc = _oracle_loss(model_s, params, batches,
                                     cfg["task_ids"])
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["accuracies"]),
                               np.asarray(exp_acc), rtol=1e-5)
    assert int(metrics["num_graphs"]) == sum(
        int(b.num_graphs) for b in batches)


@pytest.mark.parametrize("n_data,n_edge,exchange",
                         [(4, 2, "alltoall"), (2, 4, "alltoall"),
                          (4, 2, "shift"), (2, 4, "shift"),
                          (1, 8, "shift"),
                          (4, 2, "ragged_emulated"),
                          (2, 4, "ragged_emulated")])
def test_parallel_train_step_matches_single_device(n_data, n_edge,
                                                   exchange):
    cfg, meta, batches = _setup()
    mesh = make_mesh(n_data=n_data, n_edge=n_edge)
    model_p, params = _params(cfg, meta, edge_axis="edge")
    model_s, _ = _params(cfg, meta)
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": jax.tree_util.tree_map(jnp.copy, params),
             "opt_state": opt.init(params)}
    train_step, _ = make_parallel_steps(model_p, opt, cfg, cfg["task_ids"],
                                        mesh, return_grads=True)
    stack = _stack_for(batches, n_data, n_edge, exchange)
    new_state, metrics = train_step(state, stack, jax.random.PRNGKey(0))

    # Oracle: the global-batch gradient on one device. (Post-Adam params
    # are not comparable: the first Adam update is ~ -lr*sign(g), so any
    # float accumulation-order difference in a near-zero gradient flips
    # the sign; the gradient itself is the invariant.)
    def loss_fn(p):
        loss, acc = _oracle_loss(model_s, p, batches, cfg["task_ids"])
        return loss, acc

    (exp_loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        metrics["grads"], grads)


def test_empty_batch_is_a_noop():
    cfg, meta, batches = _setup(attention=False, edge_bias=False)
    mesh = make_mesh(n_data=2, n_edge=1)
    model_p, params = _params(cfg, meta)
    model_s, _ = _params(cfg, meta)
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": opt.init(params)}
    _, eval_step = make_parallel_steps(model_p, opt, cfg, cfg["task_ids"],
                                       mesh)
    # Odd count -> stacker appends one empty filler batch.
    odd = batches[:3] if len(batches) >= 3 else batches[:1]
    stack = stack_batches(odd, n_data=2, n_edge=1)
    assert stack.num_graphs.shape[0] % 2 == 0
    _, metrics = eval_step(state, stack, None)
    exp_loss, _ = _oracle_loss(model_s, params, odd, cfg["task_ids"])
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    assert int(metrics["num_graphs"]) == sum(int(b.num_graphs) for b in odd)


def test_repad_edges_preserves_forward():
    cfg, meta, batches = _setup(attention=True, edge_bias=True)
    model, params = _params(cfg, meta)
    b = batches[0]
    padded = repad_edges(b, b.edge_sources.shape[1] + 13)
    out_a = model.forward(params["graph"], b)
    out_b = model.forward(params["graph"], padded)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6)


def test_empty_batch_like_shapes():
    cfg, meta, batches = _setup(attention=False, edge_bias=False)
    b = batches[0]
    e = empty_batch_like(b)
    assert int(e.num_graphs) == 0
    assert float(np.sum(np.asarray(e.target_mask))) == 0.0
    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(b),
                              jax.tree_util.tree_leaves(e)):
        assert np.asarray(leaf_a).shape == np.asarray(leaf_b).shape


def test_runner_trains_on_mesh():
    """End-to-end: Runner with a (2,2) mesh trains the sparse model and
    improves the loss on synthetic data."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "layer_timesteps": [2, 2], "residual_connections": {"1": [0]},'
        ' "use_propagation_attention": true, "use_edge_bias": true}')
    mesh = make_mesh(n_data=2, n_edge=2)
    runner = Runner("sparse", cfg, log_dir="/tmp/mesh_runner_test",
                    train_data=synthetic_molecules(80, seed=0),
                    valid_data=synthetic_molecules(16, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    log = runner.train()
    assert len(log) == 2
    assert log[1]["train_results"][0] < log[0]["train_results"][0] * 1.5
    assert np.isfinite(log[1]["valid_results"][0])

    # Inference after node-sharded mesh training: predict must run the
    # collective-free forward on the replicated params and match a
    # single-device Runner fed the same weights.
    mols = synthetic_molecules(5, seed=2)
    got = np.concatenate([np.asarray(o) for o in runner.predict(mols)],
                         axis=1)
    assert got.shape[1] == 5 and np.isfinite(got).all()
    single = Runner("sparse", cfg, log_dir="/tmp/mesh_runner_test_single",
                    train_data=synthetic_molecules(8, seed=0),
                    valid_data=synthetic_molecules(4, seed=1),
                    quiet=True, tensorboard=False)
    single.state["params"] = jax.tree_util.tree_map(
        np.asarray, runner.state["params"])
    want = np.concatenate([np.asarray(o) for o in single.predict(mols)],
                          axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_node_shard_overflow_regrows_caps_mid_epoch():
    """A shuffled epoch whose group exceeds the planned per-shard lane
    capacities must regrow the caps and continue (one recompile), not
    kill the run — the mesh analog of the packers' overflow fallback."""
    import dataclasses
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 8, "batch_size": 120,'
        ' "layer_timesteps": [1], "residual_connections": {},'
        ' "edge_weight_dropout_keep_prob": 1.0,'
        ' "graph_state_dropout_keep_prob": 1.0}')
    mesh = make_mesh(n_data=1, n_edge=2)
    runner = Runner("sparse", cfg, log_dir="/tmp/mesh_overflow_test",
                    train_data=synthetic_molecules(48, seed=0),
                    valid_data=synthetic_molecules(12, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    assert runner._nodeshard_caps is not None
    sabotaged = dataclasses.replace(runner._nodeshard_caps, edges_local=8)
    runner._nodeshard_caps = sabotaged
    log = runner.train()
    assert np.isfinite(log[0]["train_results"][0])
    assert runner._nodeshard_caps.edges_local > sabotaged.edges_local


def test_blocked_variant_trains_on_mesh():
    """Data-parallel mesh training of the blocked (dense-path) variant:
    single bucket shape, 4-way DP, loss matches the reference semantics
    and improves."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "blocked", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 8,'
        ' "layer_timesteps": [2, 1], "residual_connections": {"1": [0]},'
        ' "dense_bucket_sizes": [32], "learning_rate": 0.003,'
        ' "edge_weight_dropout_keep_prob": 1.0}')
    mesh = make_mesh(n_data=4, n_edge=1)
    runner = Runner("blocked", cfg, log_dir="/tmp/mesh_blocked_test",
                    train_data=synthetic_molecules(64, seed=0),
                    valid_data=synthetic_molecules(16, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    log = runner.train()
    assert len(log) == 2
    assert np.isfinite(log[-1]["train_results"][0])
    assert log[-1]["train_results"][0] < log[0]["train_results"][0] * 1.5


def test_dense_mesh_rejects_edge_axis():
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config("blocked", None, '{"num_epochs": 1}')
    with pytest.raises(ValueError, match="data-parallel"):
        Runner("blocked", cfg, log_dir="/tmp/mesh_blocked_test",
               train_data=synthetic_molecules(8, seed=0),
               valid_data=synthetic_molecules(4, seed=1),
               quiet=True, tensorboard=False,
               mesh=make_mesh(n_data=2, n_edge=2))


@pytest.mark.parametrize("variant,extra", [
    ("gcn", '{"batch_size": 150}'),
    ("gcn_blocked", '{"batch_size": 8, "dense_bucket_sizes": [32]}'),
    ("async", '{"num_nodes": 150, "propagation_substeps": 40}'),
])
def test_gcn_and_async_train_on_mesh(variant, extra):
    """Generic fixed-shape data parallelism: every remaining variant
    trains over the mesh's data axis."""
    import json as _json
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    over = {"num_epochs": 1, "hidden_size": 16}
    over.update(_json.loads(extra))
    cfg = resolve_config(variant, None, _json.dumps(over))
    mesh = make_mesh(n_data=4, n_edge=1)
    runner = Runner(variant, cfg, log_dir=f"/tmp/mesh_{variant}_test",
                    train_data=synthetic_molecules(48, seed=0),
                    valid_data=synthetic_molecules(12, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    log = runner.train()
    assert np.isfinite(log[0]["train_results"][0])
    assert np.isfinite(log[0]["valid_results"][0])


def test_node_sharded_forward_matches_single_device():
    """Re-laying a batch into S node shards is a pure re-layout: running
    the sharded forward per shard (serially, no mesh) and concatenating
    the local states must reproduce the single-device forward."""
    cfg, meta, batches = _setup(attention=True, edge_bias=True)
    model, params = _params(cfg, meta)
    b = batches[0]
    caps = plan_node_shard_caps([b], 4)
    sb = shard_batch(b, caps)
    want = np.asarray(model.forward(params["graph"], b))

    # S=1 layout: the all_to_all degenerates to a local copy, so the
    # sharded code path runs end-to-end on one device and must be
    # numerically identical to the plain forward.
    caps1 = plan_node_shard_caps([b], 1)
    sb1 = shard_batch(b, caps1)
    got = np.asarray(model.forward(params["graph"], sb1.local_view()))
    np.testing.assert_allclose(got[:b.node_capacity],
                               want[:b.node_capacity], rtol=1e-5,
                               atol=1e-6)
    # 4-shard layout invariants: every real edge kept (split across the
    # local and boundary lanes), every real node row placed exactly once.
    assert float(np.asarray(sb.loc_mask).sum()
                 + np.asarray(sb.bnd_mask).sum()) == float(
        np.asarray(b.edge_mask).sum())
    nf = np.asarray(sb.node_features).reshape(-1, b.node_features.shape[1])
    np.testing.assert_array_equal(
        nf[:b.node_capacity], np.asarray(b.node_features))


def test_node_sharded_untied_multitask_parity():
    """Node sharding with tie_fwd_bkwd=false (backward edges land in
    types T..2T-1 — the composite lane keys must cover the doubled type
    axis) and two tasks: loss/accuracy parity vs the single-device
    oracle, on the shift transport."""
    cfg = default_params_for("sparse")
    cfg.update({
        "batch_size": 160, "tie_fwd_bkwd": False, "task_ids": [0, 1],
        "use_propagation_attention": True, "use_edge_bias": True,
        "edge_weight_dropout_keep_prob": 1.0,
        "graph_state_dropout_keep_prob": 1.0,
    })
    data = synthetic_molecules(40, seed=6, num_targets=2)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    proc = packing.preprocess_sparse(
        data, meta.num_edge_types, cfg["tie_fwd_bkwd"], cfg["task_ids"],
        cfg["task_sample_ratios"], False)
    caps = packing.plan_capacities(proc, meta.num_edge_types,
                                   cfg["batch_size"])
    batches = list(packing.pack_sparse_batches(
        proc, meta.num_edge_types, cfg["batch_size"], caps,
        cfg["hidden_size"], meta.annotation_size, False, None))
    assert meta.num_edge_types == 8  # 4 bond types doubled

    mesh = make_mesh(n_data=2, n_edge=4)
    model_p, params = _params(cfg, meta, edge_axis="edge")
    model_s, _ = _params(cfg, meta)
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": opt.init(params)}
    _, eval_step = make_parallel_steps(model_p, opt, cfg, cfg["task_ids"],
                                       mesh)
    stack = _stack_for(batches, 2, 4, exchange="shift")
    _, metrics = eval_step(state, stack, None)
    exp_loss, exp_acc = _oracle_loss(model_s, params, batches,
                                     cfg["task_ids"])
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["accuracies"]),
                               np.asarray(exp_acc), rtol=1e-5)


def test_use_graph_false_on_mesh():
    """The use_graph=False ablation (readout over zeroed states,
    chem_tensorflow.py:144-147) must run under the node-sharded mesh
    step too."""
    cfg, meta, batches = _setup(attention=False, edge_bias=False)
    cfg["use_graph"] = False
    mesh = make_mesh(n_data=2, n_edge=4)
    model_p, params = _params(cfg, meta, edge_axis="edge")
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": opt.init(params)}
    train_step, _ = make_parallel_steps(model_p, opt, cfg,
                                        cfg["task_ids"], mesh)
    stack = _stack_for(batches, 2, 4)
    _, metrics = train_step(state, stack, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("exchange",
                         ["alltoall", "shift", "ragged_emulated"])
def test_node_sharded_giant_graph_parity(exchange):
    """The stress case SURVEY §5.7 names: ONE large connected graph
    deliberately split across shards (substantial cut, heavily used
    boundary lanes) — loss and every gradient leaf must still match
    the single-device oracle, under both boundary transports."""
    from ggnn_tpu.data.synthetic import synthetic_giant_graph
    from ggnn_tpu.parallel.node_shard import (plan_node_shard_caps,
                                              shard_and_stack)

    cfg = default_params_for("sparse")
    cfg.update({"batch_size": 2000, "layer_timesteps": [2, 1],
                "residual_connections": {"1": [0]},
                "use_propagation_attention": True, "use_edge_bias": True,
                "edge_weight_dropout_keep_prob": 1.0,
                "graph_state_dropout_keep_prob": 1.0})
    data = synthetic_giant_graph(600, seed=5)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    proc = packing.preprocess_sparse(
        data, meta.num_edge_types, cfg["tie_fwd_bkwd"], cfg["task_ids"],
        cfg["task_sample_ratios"], False)
    caps = packing.plan_capacities(proc, meta.num_edge_types,
                                   cfg["batch_size"])
    batches = list(packing.pack_sparse_batches(
        proc, meta.num_edge_types, cfg["batch_size"], caps,
        cfg["hidden_size"], meta.annotation_size, False, None))
    assert len(batches) == 1  # one giant packed graph

    n_data, n_edge = 1, 8
    ns_caps = plan_node_shard_caps(batches, n_edge)
    stack = shard_and_stack(batches, ns_caps, n_data=n_data,
                            exchange=exchange)
    # The split must actually exercise the boundary path.
    boundary_edges = float((np.asarray(stack.bnd_mask) > 0).sum())
    assert boundary_edges > 100, boundary_edges

    mesh = make_mesh(n_data=n_data, n_edge=n_edge)
    model_p, params = _params(cfg, meta, edge_axis="edge")
    model_s, _ = _params(cfg, meta)
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": jax.tree_util.tree_map(jnp.copy, params),
             "opt_state": opt.init(params)}
    train_step, _ = make_parallel_steps(model_p, opt, cfg, cfg["task_ids"],
                                        mesh, return_grads=True)
    _, metrics = train_step(state, stack, jax.random.PRNGKey(0))

    def loss_fn(p):
        return _oracle_loss(model_s, p, batches, cfg["task_ids"])

    (exp_loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        metrics["grads"], grads)


def test_process_aligned_rows_is_none_single_process():
    """Single-process sessions must take the replicated-stack path (the
    per-process feeding optimisation only exists under jax.distributed)."""
    from ggnn_tpu.parallel.mesh import process_aligned_data_rows
    mesh = make_mesh(n_data=2, n_edge=2)
    assert process_aligned_data_rows(mesh) is None


def test_node_shard_boundary_capacity_overflow_raises():
    cfg, meta, batches = _setup()
    from ggnn_tpu.parallel.node_shard import NodeShardCaps
    b = batches[0]
    good = plan_node_shard_caps([b], 4)
    src = np.asarray(b.edge_sources)[np.asarray(b.edge_mask) > 0]
    tgt = np.asarray(b.edge_targets)[np.asarray(b.edge_mask) > 0]
    if not np.any(src // good.nodes_local != tgt // good.nodes_local):
        pytest.skip("no cut edges in this batch")
    bad = NodeShardCaps(n_shards=4, nodes_local=good.nodes_local,
                        edges_local=good.edges_local,
                        edges_boundary=good.edges_boundary, boundary=0)
    with pytest.raises(ValueError):
        shard_batch(b, bad)
    bad_lane = NodeShardCaps(n_shards=4, nodes_local=good.nodes_local,
                             edges_local=0,
                             edges_boundary=good.edges_boundary,
                             boundary=good.boundary)
    with pytest.raises(ValueError):
        shard_batch(b, bad_lane)


def test_ragged_send_spec_layout_invariants():
    """Host-side construction of the ragged transport: the routing
    rows must satisfy jax.lax.ragged_all_to_all's documented
    consistency constraint (send_sizes == all_to_all(recv_sizes), i.e.
    recv_sizes = send_sizes.T), pack dest-major on the sender, land
    owner-major at TRUE offsets on the receiver, and fit the planned
    static totals."""
    import dataclasses as _dc

    from ggnn_tpu.parallel.node_shard import shard_batch as _shard

    cfg, meta, batches = _setup()
    n_edge = 4
    caps = plan_node_shard_caps(batches, n_edge)
    sb = _shard(batches[0], caps, exchange="ragged")
    spec = sb.send_idx
    s_count = n_edge
    ss = np.asarray(spec.send_sizes)
    if ss.sum() == 0:
        pytest.skip("no cut edges in this batch")
    np.testing.assert_array_equal(np.asarray(spec.recv_sizes), ss.T)
    io = np.asarray(spec.input_offsets)
    np.testing.assert_array_equal(
        io, np.concatenate([np.zeros((s_count, 1), io.dtype),
                            np.cumsum(ss, axis=1)[:, :-1]], axis=1))
    oo = np.asarray(spec.output_offsets)
    np.testing.assert_array_equal(
        oo, np.cumsum(np.concatenate(
            [np.zeros((1, s_count), oo.dtype), ss[:-1]], axis=0), axis=0))
    assert int(ss.sum(axis=1).max()) <= caps.boundary_send_total
    assert int(ss.sum(axis=0).max()) <= spec.recv_cap
    assert spec.recv_cap == caps.boundary_recv_total
    # bnd_src rows stay inside the receive table.
    assert int(np.asarray(sb.bnd_src).max()) < spec.recv_cap
    # Totals overflow raises (same policy as the per-pair lanes).
    bad = _dc.replace(caps, boundary_send_total=0, boundary_recv_total=0)
    with pytest.raises(ValueError):
        _shard(batches[0], bad, exchange="ragged")


def _gcn_setup(n_mols=48, batch_nodes=160):
    cfg = default_params_for("gcn")
    cfg.update({"batch_size": batch_nodes,
                "graph_state_dropout_keep_prob": 1.0})
    data = synthetic_molecules(n_mols, seed=3)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    proc = packing.preprocess_gcn(data, cfg["task_ids"],
                                  cfg["task_sample_ratios"], False)
    caps = packing.plan_gcn_capacities(proc, cfg["batch_size"])
    batches = list(packing.pack_gcn_batches(
        proc, cfg["batch_size"], caps, cfg["hidden_size"],
        meta.annotation_size, False, None))
    assert len(batches) >= 2
    return cfg, meta, batches


@pytest.mark.parametrize("n_data,n_edge,exchange",
                         [(4, 2, "alltoall"), (2, 4, "alltoall"),
                          (2, 4, "ragged_emulated")])
def test_gcn_node_sharded_matches_single_device(n_data, n_edge, exchange):
    """GCN over the node-sharded boundary-exchange layout: loss and
    every gradient leaf must match the single-device global-batch
    oracle (same contract as the sparse node-shard tests)."""
    from ggnn_tpu.models.gcn import GCN
    from ggnn_tpu.parallel.node_shard import (gcn_shard_and_stack,
                                              plan_gcn_shard_caps)

    cfg, meta, batches = _gcn_setup()
    mesh = make_mesh(n_data=n_data, n_edge=n_edge)
    model_p = GCN(cfg, edge_axis="edge")
    model_s = GCN(cfg)
    key = jax.random.PRNGKey(7)
    params = {
        "graph": model_p.init_params(key),
        "heads": init_output_heads(key, cfg["hidden_size"],
                                   cfg["task_ids"]),
    }
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": jax.tree_util.tree_map(jnp.copy, params),
             "opt_state": opt.init(params)}
    train_step, eval_step = make_parallel_steps(
        model_p, opt, cfg, cfg["task_ids"], mesh, return_grads=True,
        batch_kind="gcn")
    ns_caps = plan_gcn_shard_caps(batches, n_edge)
    stack = gcn_shard_and_stack(batches, ns_caps, n_data=n_data,
                                exchange=exchange)

    def loss_fn(p):
        return _oracle_loss(model_s, p, batches, cfg["task_ids"])

    (exp_loss, exp_acc), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    _, metrics = eval_step(state, stack, None)
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["accuracies"]),
                               np.asarray(exp_acc), rtol=1e-5)

    _, tmetrics = train_step(state, stack, jax.random.PRNGKey(0))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        tmetrics["grads"], grads)


def test_gcn_runner_trains_node_sharded():
    """End-to-end: Runner with an active edge axis drives the GCN
    node-sharded path (plan, stack, overflow-regrow plumbing)."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "gcn", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "boundary_exchange": "shift"}')  # runner plumbing for the
    # shift-bucketed transport rides along in this end-to-end test
    mesh = make_mesh(n_data=2, n_edge=2)
    runner = Runner("gcn", cfg, log_dir="/tmp/mesh_gcn_ns_test",
                    train_data=synthetic_molecules(64, seed=0),
                    valid_data=synthetic_molecules(16, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    assert runner._mesh_kind == "gcn"
    assert runner._nodeshard_caps is not None
    log = runner.train()
    assert len(log) == 2
    assert np.isfinite(log[-1]["train_results"][0])
    assert log[-1]["train_results"][0] < log[0]["train_results"][0] * 1.5


def test_boundary_exchange_auto_resolves_per_backend():
    """"boundary_exchange": "auto" picks the lowest-wire transport the
    backend can execute: ragged on TPU, shift on CPU (XLA:CPU has no
    ragged-all-to-all kernel) — and the CPU resolution trains."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 16, "batch_size": 150,'
        ' "boundary_exchange": "auto",'
        ' "edge_weight_dropout_keep_prob": 1.0}')
    mesh = make_mesh(n_data=2, n_edge=2)
    runner = Runner("sparse", cfg, log_dir="/tmp/mesh_auto_exchange",
                    train_data=synthetic_molecules(48, seed=0),
                    valid_data=synthetic_molecules(12, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    assert runner._resolve_exchange() == "shift"  # tests run on CPU
    log = runner.train()
    assert np.isfinite(log[0]["train_results"][0])


@pytest.mark.parametrize("n_data,n_edge", [(4, 2), (2, 4)])
def test_type_tp_matches_single_device(n_data, n_edge):
    """Tensor parallelism over the [T, H, H] edge weights: sharding the
    type axis (weights + edge lanes) is a pure re-layout — loss and
    every gradient leaf match the single-device oracle, including the
    global-norm clip on sharded leaves."""
    cfg, meta, batches = _setup()
    assert meta.num_edge_types % n_edge == 0
    mesh = make_mesh(n_data=n_data, n_edge=n_edge)
    model_p, params = _params(cfg, meta, edge_axis="edge")
    model_s, _ = _params(cfg, meta)
    from ggnn_tpu.parallel.mesh import EDGE_AXIS
    from ggnn_tpu.parallel.tp import is_tp_sharded_path
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"],
                         tp_axis=EDGE_AXIS,
                         tp_is_sharded=is_tp_sharded_path)
    state = {"params": jax.tree_util.tree_map(jnp.copy, params),
             "opt_state": opt.init(params)}
    train_step, eval_step = make_parallel_steps(
        model_p, opt, cfg, cfg["task_ids"], mesh, return_grads=True,
        batch_kind="sparse_tp", state_template=state)
    stack = stack_batches(batches, n_data=n_data, n_edge=1)
    new_state, metrics = train_step(state, stack, jax.random.PRNGKey(0))

    def loss_fn(p):
        return _oracle_loss(model_s, p, batches, cfg["task_ids"])

    (exp_loss, _), grads = jax.value_and_grad(
        lambda p: loss_fn(p), has_aux=True)(params)
    np.testing.assert_allclose(float(metrics["loss"]), float(exp_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        metrics["grads"], grads)
    # Post-step sharded weights assemble to a full [T, H, H] per layer.
    w0 = np.asarray(new_state["params"]["graph"]["layers"][0]["edge_weights"])
    assert w0.shape == (meta.num_edge_types, cfg["hidden_size"],
                        cfg["hidden_size"])


def test_type_tp_runner_end_to_end():
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "edge_parallelism": "type_tp",'
        ' "use_propagation_attention": true, "use_edge_bias": true}')
    mesh = make_mesh(n_data=2, n_edge=2)
    runner = Runner("sparse", cfg, log_dir="/tmp/mesh_tp_test",
                    train_data=synthetic_molecules(60, seed=0),
                    valid_data=synthetic_molecules(16, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    log = runner.train()
    assert len(log) == 2
    assert np.isfinite(log[1]["valid_results"][0])

    # Inference after TP mesh training: predict must assemble the
    # type-sharded edge weights into the collective-free forward and
    # match a single-device Runner fed the same (gathered) params.
    mols = synthetic_molecules(5, seed=2)
    got = np.concatenate([np.asarray(o) for o in runner.predict(mols)],
                         axis=1)
    assert got.shape[1] == 5 and np.isfinite(got).all()
    single = Runner("sparse", cfg, log_dir="/tmp/mesh_tp_test_single",
                    train_data=synthetic_molecules(8, seed=0),
                    valid_data=synthetic_molecules(4, seed=1),
                    quiet=True, tensorboard=False)
    single.state["params"] = jax.tree_util.tree_map(
        np.asarray, runner.state["params"])
    want = np.concatenate([np.asarray(o) for o in single.predict(mols)],
                          axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_runner_trains_giant_graph_corpus_on_mesh(tmp_path):
    """Giant-graph training as a FIRST-CLASS Runner path (round-5
    VERDICT item #9): a corpus of large connected graphs — each batch
    ONE deliberately split giant graph — trained through
    `Runner(mesh=...)` on the 8-shard edge axis with capacity planning,
    DFS locality reorder, and checkpointing all engaged; then the best
    checkpoint restores into a fresh mesh Runner AND serves single-chip
    predictions. Proves the SP/CP analog is a production path, not a
    bench harness."""
    from ggnn_tpu.data.synthetic import synthetic_giant_graph
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 3, "hidden_size": 16, "batch_size": 700,'
        ' "layer_timesteps": [2, 1], "residual_connections": {"1": [0]},'
        ' "locality_reorder": true, "use_edge_bias": true,'
        ' "edge_weight_dropout_keep_prob": 1.0}')
    train = [synthetic_giant_graph(600, seed=s)[0] for s in range(4)]
    valid = [synthetic_giant_graph(600, seed=10 + s)[0] for s in range(2)]
    mesh = make_mesh(n_data=1, n_edge=8)
    runner = Runner("sparse", cfg, log_dir=str(tmp_path),
                    train_data=train, valid_data=valid,
                    quiet=True, tensorboard=False, mesh=mesh)
    # Each giant graph must genuinely exercise the boundary lanes.
    assert runner._nodeshard_caps is not None
    assert runner._nodeshard_caps.boundary_send_total > 50
    log = runner.train()
    assert len(log) == 3
    losses = [e["train_results"][0] for e in log]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # converging on the giant corpus

    # Best checkpoint restores into a FRESH mesh Runner and resumes.
    resumed = Runner("sparse", cfg, log_dir=str(tmp_path / "resume"),
                     train_data=train, valid_data=valid,
                     quiet=True, tensorboard=False, mesh=mesh,
                     restore=runner.best_model_file)
    log2 = resumed.train()
    assert np.isfinite(log2[-1]["train_results"][0])

    # And serves (single-chip forward on the replicated params).
    preds = np.concatenate(
        [np.asarray(o) for o in resumed.predict(valid)], axis=1)
    assert preds.shape == (1, 2) and np.isfinite(preds).all()


def test_overlap_compiler_options_platform_gating():
    """TPU-only: the async-collective/latency-hiding options must be
    empty on CPU meshes (XLA:CPU rejects xla_tpu_* options) and on
    single-device meshes (nothing to overlap)."""
    from ggnn_tpu.parallel import overlap_compiler_options

    cpu_mesh = make_mesh(n_data=2, n_edge=2)
    assert overlap_compiler_options(cpu_mesh) == {}
    single = make_mesh(n_data=1, n_edge=1)
    assert overlap_compiler_options(single) == {}


def test_shard_batch_rejects_undersized_layout():
    """A batch whose node capacity exceeds S * nodes_local must raise
    ValueError (round-5 review: it used to silently ZERO the overflow
    node rows and DROP their edges — wrong results, no error — and cut
    edges to out-of-range owners died with a raw numpy IndexError that
    bypassed the runner's ValueError-triggered capacity regrow)."""
    import dataclasses

    import pytest
    from ggnn_tpu.parallel.node_shard import (plan_node_shard_caps,
                                              shard_batch)

    cfg, meta, batches = _setup()
    caps = plan_node_shard_caps(batches, 2)
    small = dataclasses.replace(caps, nodes_local=batches[0].node_capacity
                                // 4)
    with pytest.raises(ValueError, match="exceeds the shard layout"):
        shard_batch(batches[0], small)


def test_plan_caps_nodes_local_pin():
    """Replanning a SUBSET of batches with nodes_local pinned to the
    active caps must count edges under the active owner arithmetic
    (round-5 review: an unpinned subset replan derived a smaller nl,
    under-counted per-shard edges, and passed the overflow pre-check
    while the real shard relayout overflowed)."""
    from ggnn_tpu.parallel.node_shard import (plan_node_shard_caps,
                                              shard_batch)

    cfg, meta, batches = _setup()
    caps = plan_node_shard_caps(batches, 2, margin=1.0)
    # Subset replan, pinned: must reproduce counts that shard_batch
    # with the ACTIVE caps can actually satisfy.
    sub = [batches[0]]
    need = plan_node_shard_caps(sub, 2, margin=1.0,
                                nodes_local=caps.nodes_local)
    assert need.nodes_local == caps.nodes_local
    # Pinned counts are an upper bound wrt the active layout: sharding
    # under caps grown to `need` succeeds.
    import dataclasses
    grown = dataclasses.replace(
        caps,
        edges_local=max(caps.edges_local, need.edges_local),
        edges_boundary=max(caps.edges_boundary, need.edges_boundary))
    shard_batch(sub[0], grown)  # must not raise


def test_dp_mesh_keeps_combined_lane_and_matches_single_device():
    """A PURE data-parallel sparse mesh (n_edge=1) keeps the
    type-combined aggregation lane (round-5 review: it was stripped on
    every mesh run, forfeiting the ~3x single-chip layout win) and
    still computes the single-device loss."""
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 16, "batch_size": 120,'
        ' "edge_weight_dropout_keep_prob": 1.0,'
        ' "graph_state_dropout_keep_prob": 1.0}')
    mesh = make_mesh(n_data=2, n_edge=1)
    runner = Runner("sparse", cfg, log_dir="/tmp/dp_combined_test",
                    train_data=synthetic_molecules(48, seed=0),
                    valid_data=synthetic_molecules(12, seed=1),
                    quiet=True, tensorboard=False, mesh=mesh)
    assert runner._dp_combined  # packers planned a combined lane
    log = runner.train()
    assert np.isfinite(log[0]["train_results"][0])

    # Oracle: the SAME mesh with the combined lane disabled in the
    # model (config flag) — identical update grouping and semantics,
    # different aggregation layout; epoch metrics must agree.
    typed = Runner("sparse", resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 16, "batch_size": 120,'
        ' "combined_edge_lanes": false,'
        ' "edge_weight_dropout_keep_prob": 1.0,'
        ' "graph_state_dropout_keep_prob": 1.0}'),
        log_dir="/tmp/dp_combined_typed",
        train_data=synthetic_molecules(48, seed=0),
        valid_data=synthetic_molecules(12, seed=1),
        quiet=True, tensorboard=False,
        mesh=make_mesh(n_data=2, n_edge=1))
    tlog = typed.train()
    np.testing.assert_allclose(log[0]["train_results"][0],
                               tlog[0]["train_results"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(log[0]["valid_results"][0],
                               tlog[0]["valid_results"][0],
                               rtol=1e-5)
