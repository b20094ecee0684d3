"""End-to-end training framework tests on synthetic data."""

import copy
import glob
import json
import os

import numpy as np
import jax
import pytest

from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.training.config import resolve_config, default_params_for
from ggnn_tpu.training.optimizer import clip_by_norm_per_leaf, tf_adam
from ggnn_tpu.training.runner import Runner


def small_config(variant, **overrides):
    cfg = default_params_for(variant)
    cfg.update({"hidden_size": 16, "num_epochs": 2, "random_seed": 0})
    if variant in ("sparse", "rgcn", "gcn"):
        cfg["batch_size"] = 600
    if variant in ("dense", "gcn_blocked"):
        cfg["batch_size"] = 16
    if variant == "async":
        cfg["num_nodes"] = 600
        cfg["propagation_substeps"] = 40
    cfg.update(overrides)
    return cfg


def make_runner(variant, tmp_path, n=120, **overrides):
    cfg = small_config(variant, **overrides)
    adapter_kwargs = {"drop_remainder": False} if variant == "dense" else None
    return Runner(
        variant, cfg, log_dir=str(tmp_path), quiet=True,
        train_data=synthetic_molecules(n, seed=0),
        valid_data=synthetic_molecules(max(20, n // 5), seed=1),
        adapter_kwargs=adapter_kwargs,
    )


def test_runner_sparse_batches_carry_combined_lane(tmp_path):
    """Regression: SparseAdapter.plan() used to merge split capacities
    without `edges_all`, silently disabling the type-combined edge lane
    (a ~2.7x slowdown) for all Runner/CLI training. Both the native and
    python pipelines must emit the lane."""
    for native in (True, False):
        runner = make_runner("sparse", tmp_path, n=40, native_pack=native)
        assert runner.adapter.caps.edges_all > 0
        for batch in runner.adapter.batches(runner.valid_processed, False):
            assert batch.edge_sources_all is not None


def test_pack_margin_config_controls_capacities(tmp_path):
    """`pack_margin` tunes the planned lane occupancy (default 1.05)."""
    tight = make_runner("sparse", tmp_path, n=40, pack_margin=1.0)
    loose = make_runner("sparse", tmp_path, n=40, pack_margin=1.5)
    assert loose.adapter.caps.edges_all > tight.adapter.caps.edges_all


def test_runner_async_batches_carry_segment_plan(tmp_path):
    """Regression: AsyncAdapter.plan() used to rebuild AsyncCapacities
    from per-split maxima and drop the `plan` field, so Runner/CLI async
    training silently fell back to the uniform-lane path (~5.6x slower).
    Every Runner-produced async batch must carry segments."""
    runner = make_runner("async", tmp_path, n=40)
    assert runner.adapter.caps.plan is not None
    for split in (runner.train_processed, runner.valid_processed):
        for batch in runner.adapter.batches(split, False):
            assert batch.seg_rounds is not None


@pytest.mark.parametrize("variant",
                         ["sparse", "dense", "gcn", "gcn_blocked", "rgcn"])
def test_training_reduces_loss(variant, tmp_path):
    epochs = 4 if variant == "rgcn" else 2  # 8-layer ReLU-RNN learns slowly
    runner = make_runner(variant, tmp_path, num_epochs=epochs,
                         learning_rate=0.003)
    log = runner.train()
    assert len(log) == epochs
    first_train_loss = log[0]["train_results"][0]
    last_train_loss = log[-1]["train_results"][0]
    assert np.isfinite(first_train_loss)
    assert last_train_loss < first_train_loss
    # epoch log file written and loadable
    with open(runner.log_file) as f:
        saved = json.load(f)
    assert saved[0]["epoch"] == 1
    # best checkpoint saved
    assert os.path.exists(runner.best_model_file)


def test_async_training_smoke(tmp_path):
    runner = make_runner("async", tmp_path, n=60)
    log = runner.train()
    assert np.isfinite(log[-1]["valid_results"][0])


def test_checkpoint_restore_roundtrip(tmp_path):
    runner = make_runner("sparse", tmp_path, n=60, num_epochs=1)
    runner.train()
    ckpt = runner.best_model_file

    cfg = small_config("sparse", num_epochs=1)
    restored = Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
                      restore=ckpt,
                      train_data=synthetic_molecules(60, seed=0),
                      valid_data=synthetic_molecules(20, seed=1))
    # weights restored exactly
    w_orig = np.asarray(
        runner.state["params"]["graph"]["layers"][0]["edge_weights"])
    w_rest = np.asarray(
        restored.state["params"]["graph"]["layers"][0]["edge_weights"])
    np.testing.assert_array_equal(w_orig, w_rest)
    assert restored.train_step_id == runner.train_step_id


def test_restore_splits_legacy_stacked_async_weights(tmp_path):
    """Round-2 async checkpoints stored edge_weights as ONE stacked
    [T, H, H] array; the model now keeps per-type leaves (per-variable
    clip parity). Restore must slice the stacked array across the
    indexed leaves instead of silently fresh-initializing them."""
    import pickle

    runner = make_runner("async", tmp_path, n=60, num_epochs=1)
    runner.train()
    ckpt = runner.best_model_file
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    base = "['params']['graph']['edge_weights']"
    per_type = {k: v for k, v in payload["weights"].items()
                if k.startswith(base + "[")}
    assert per_type, "expected per-index async edge weights in checkpoint"
    stacked = np.stack([per_type[f"{base}[{i}]"]
                        for i in range(len(per_type))])
    for k in per_type:
        del payload["weights"][k]
    payload["weights"][base] = stacked
    legacy = str(tmp_path / "legacy_stacked.pickle")
    with open(legacy, "wb") as f:
        pickle.dump(payload, f)

    logs = []
    from ggnn_tpu.training.checkpoint import restore_checkpoint
    restored, _, _ = restore_checkpoint(
        legacy, runner.config, runner.state, log=logs.append)
    for i in range(stacked.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["graph"]["edge_weights"][i]),
            stacked[i])
    assert not any("Freshly initializing" in m and "edge_weights" in m
                   for m in logs), logs
    assert any("Splitting legacy stacked" in m for m in logs)


def test_checkpoint_config_mismatch_rejected(tmp_path):
    runner = make_runner("sparse", tmp_path, n=40, num_epochs=1)
    runner.train()
    cfg = small_config("sparse", num_epochs=1, hidden_size=8)
    with pytest.raises(AssertionError):
        Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
               restore=runner.best_model_file,
               train_data=synthetic_molecules(40, seed=0),
               valid_data=synthetic_molecules(20, seed=1))


def test_freeze_graph_model(tmp_path):
    cfg = small_config("sparse", num_epochs=1)
    runner = Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
                    freeze_graph_model=True,
                    train_data=synthetic_molecules(60, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    before = copy.deepcopy(jax.tree_util.tree_map(
        np.asarray, runner.state["params"]))
    runner.train()
    after = jax.tree_util.tree_map(np.asarray, runner.state["params"])
    # graph weights untouched, heads moved
    np.testing.assert_array_equal(
        before["graph"]["layers"][0]["edge_weights"],
        after["graph"]["layers"][0]["edge_weights"])
    assert not np.allclose(before["heads"]["task0"]["gate"][0]["W"],
                           after["heads"]["task0"]["gate"][0]["W"])


def test_use_graph_false_ablation(tmp_path):
    runner = make_runner("sparse", tmp_path, n=40, use_graph=False,
                         num_epochs=1)
    log = runner.train()
    assert np.isfinite(log[0]["train_results"][0])


def test_clip_by_norm_per_leaf():
    import jax.numpy as jnp
    opt = clip_by_norm_per_leaf(1.0)
    grads = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.1, 0.0])}
    clipped, _ = opt.update(grads, opt.init(grads))
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8],
                               rtol=1e-6)  # norm 5 -> scaled to 1
    np.testing.assert_allclose(np.asarray(clipped["b"]), [0.1, 0.0],
                               rtol=1e-6)  # norm < 1 untouched


def test_tf_adam_matches_tf1_formula():
    import jax.numpy as jnp
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    opt = tf_adam(lr, b1, b2, eps)
    g = {"w": jnp.array([0.5, -2.0])}
    state = opt.init(g)
    upd1, state = opt.update(g, state)
    # step 1: m=(1-b1)g, v=(1-b2)g^2 ; lr_1 = lr*sqrt(1-b2)/(1-b1)
    gg = np.array([0.5, -2.0])
    m = (1 - b1) * gg
    v = (1 - b2) * gg ** 2
    lr1 = lr * np.sqrt(1 - b2) / (1 - b1)
    want = -lr1 * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(np.asarray(upd1["w"]), want, rtol=1e-5)


def test_example_evaluation_prints(tmp_path, capsys):
    runner = make_runner("sparse", tmp_path, n=40, num_epochs=1)
    runner.example_evaluation(example_molecules=synthetic_molecules(5, seed=9))
    out = capsys.readouterr().out
    assert out.count("[") >= 5  # five target lines + prediction arrays


def test_resolve_config_layering(tmp_path):
    cfg_file = tmp_path / "c.json"
    cfg_file.write_text(json.dumps({"hidden_size": 64, "patience": 7}))
    cfg = resolve_config("sparse", str(cfg_file), '{"patience": 3}')
    assert cfg["hidden_size"] == 64
    assert cfg["patience"] == 3        # inline JSON wins
    assert cfg["layer_timesteps"] == [2, 2, 1, 2, 1]


def test_save_every_epoch_and_resume_latest(tmp_path):
    cfg = small_config("sparse", num_epochs=2)
    runner = Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
                    save_every_epoch=True,
                    train_data=synthetic_molecules(40, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    runner.train()
    assert os.path.exists(runner.last_model_file)
    resumed = Runner("sparse", small_config("sparse", num_epochs=1),
                     log_dir=str(tmp_path), quiet=True,
                     restore=runner.last_model_file,
                     train_data=synthetic_molecules(40, seed=0),
                     valid_data=synthetic_molecules(20, seed=1))
    assert resumed.train_step_id == runner.train_step_id


def test_blocked_variant_trains(tmp_path):
    runner = make_runner("blocked", tmp_path, n=60, num_epochs=4,
                         batch_size=32,
                         layer_timesteps=[2, 1],
                         residual_connections={"1": [0]},
                         edge_weight_dropout_keep_prob=1.0,
                         learning_rate=0.003)
    log = runner.train()
    assert log[-1]["train_results"][0] < log[0]["train_results"][0]


def test_multitask_training_with_sample_ratios(tmp_path):
    """Two regression tasks, task 1 sampled at 50% (labels blanked past
    the prefix, chem_tensorflow_sparse.py:243-250); both losses finite
    and improving, per-task accuracies reported."""
    cfg = small_config("sparse", num_epochs=2, task_ids=[0, 1],
                       task_sample_ratios={"1": 0.5},
                       learning_rate=0.003)
    runner = Runner(
        "sparse", cfg, log_dir=str(tmp_path), quiet=True,
        train_data=synthetic_molecules(80, seed=0, num_targets=2),
        valid_data=synthetic_molecules(20, seed=1, num_targets=2))
    log = runner.train()
    accs0 = log[0]["train_results"][1]
    assert len(accs0) == 2
    assert all(np.isfinite(a) for a in accs0)
    assert log[-1]["train_results"][0] < log[0]["train_results"][0]


def test_multitask_partial_restore_new_head(tmp_path):
    """Restoring a 1-task checkpoint into a 2-task model keeps the graph
    weights and freshly initializes the new head
    (chem_tensorflow.py:342-357 partial-restore semantics)."""
    runner = make_runner("sparse", tmp_path, n=40, num_epochs=1)
    runner.train()
    cfg = small_config("sparse", num_epochs=1, task_ids=[0, 1])
    restored = Runner(
        "sparse", cfg, log_dir=str(tmp_path), quiet=True,
        restore=runner.best_model_file,
        train_data=synthetic_molecules(40, seed=0, num_targets=2),
        valid_data=synthetic_molecules(20, seed=1, num_targets=2))
    np.testing.assert_array_equal(
        np.asarray(runner.state["params"]["graph"]["layers"][0]["edge_weights"]),
        np.asarray(restored.state["params"]["graph"]["layers"][0]["edge_weights"]))
    assert "task1" in restored.state["params"]["heads"]


def test_untied_fwd_bkwd_training(tmp_path):
    """tie_fwd_bkwd=False doubles the edge-type set with distinct
    backward weights (fixing the reference's out-of-range-type bug,
    chem_tensorflow_sparse.py:271); training must run and improve."""
    runner = make_runner("sparse", tmp_path, n=60, num_epochs=2,
                         tie_fwd_bkwd=False, learning_rate=0.003)
    t_dim = runner.meta.num_edge_types
    assert t_dim == 8  # 4 bond types doubled
    w = runner.state["params"]["graph"]["layers"][0]["edge_weights"]
    assert w.shape[0] == 8
    log = runner.train()
    assert log[-1]["train_results"][0] < log[0]["train_results"][0]


def test_predict_on_mesh_runner(tmp_path):
    """example_evaluation works on a mesh-trained Runner (inference runs
    single-device on a collective-free model copy)."""
    from ggnn_tpu.parallel import make_mesh
    cfg = small_config("sparse", num_epochs=1, batch_size=120)
    runner = Runner("sparse", cfg, log_dir=str(tmp_path), quiet=True,
                    mesh=make_mesh(n_data=2, n_edge=2),
                    train_data=synthetic_molecules(40, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    runner.train()
    outs = runner.predict(synthetic_molecules(5, seed=3))
    assert sum(o.shape[1] for o in outs) == 5


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Directory checkpoint paths use Orbax storage with identical
    semantics (config-compat assert, exact weights, step counters)."""
    import pytest
    pytest.importorskip("orbax.checkpoint")
    from ggnn_tpu.training.checkpoint import (restore_checkpoint,
                                              save_checkpoint)
    runner = make_runner("sparse", tmp_path, n=40, num_epochs=1)
    runner.train()
    ckpt_dir = str(tmp_path / "orbax_ckpt")
    save_checkpoint(ckpt_dir, runner.config, runner.state,
                    runner.train_step_id, runner.valid_step_id)
    assert os.path.isdir(ckpt_dir)
    state2, ts, vs = restore_checkpoint(ckpt_dir, runner.config,
                                        runner.state, log=lambda *a: None)
    assert ts == runner.train_step_id and vs == runner.valid_step_id
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        runner.state, state2)
    # overwrite works (rolling best-checkpoint behavior)
    save_checkpoint(ckpt_dir, runner.config, runner.state, ts + 1, vs)
    _, ts2, _ = restore_checkpoint(ckpt_dir, runner.config, runner.state,
                                   log=lambda *a: None)
    assert ts2 == ts + 1
    # config mismatch still rejected
    bad = dict(runner.config); bad["hidden_size"] = 99
    with pytest.raises(AssertionError):
        restore_checkpoint(ckpt_dir, bad, runner.state, log=lambda *a: None)


def test_train_on_device_fast_path(tmp_path):
    """Compiled multi-epoch training improves the loss with one host
    round trip, and the resulting state serves predictions."""
    runner = make_runner("sparse", tmp_path, n=60, num_epochs=1,
                         learning_rate=0.003)
    base_loss = runner.run_epoch("probe", runner.valid_processed, False)[0]
    final_loss = runner.train_on_device(8)
    assert np.isfinite(final_loss)
    after_loss = runner.run_epoch("probe2", runner.valid_processed,
                                  False)[0]
    assert after_loss < base_loss
    outs = runner.predict(synthetic_molecules(3, seed=4))
    assert sum(o.shape[1] for o in outs) == 3


def test_mid_epoch_resume_continues_batch_stream(tmp_path):
    """SURVEY §5.3 resumable iterator state: a run killed mid-epoch
    resumes the SAME epoch at the SAME batch-stream position and ends
    with the same final state as an uninterrupted run."""
    import jax
    from ggnn_tpu.training.checkpoint import load_iterator_state

    data = synthetic_molecules(60, seed=0)
    valid = synthetic_molecules(12, seed=1)
    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "edge_weight_dropout_keep_prob": 1.0,'
        ' "graph_state_dropout_keep_prob": 1.0}')

    # Reference run: 2 uninterrupted epochs.
    ref = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "ref"),
                 train_data=data, valid_data=valid, quiet=True,
                 tensorboard=False)
    ref.train()

    # Interrupted run: checkpoint the iterator state every step, stop
    # after epoch 1 + 2 steps of epoch 2 (simulated preemption).
    runner = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "a"),
                    train_data=data, valid_data=valid, quiet=True,
                    tensorboard=False, checkpoint_every_steps=1)

    # Interruption is simulated by capturing the rolling checkpoint
    # written after step 1 of epoch 2 (what a preempted run would leave
    # behind), while the donor run itself completes.
    import shutil
    saved = {}
    from ggnn_tpu.training import runner as runner_mod
    orig_save = runner_mod.save_checkpoint

    def capture_save(path, config, state, ts, vs, iterator_state=None):
        orig_save(path, config, state, ts, vs, iterator_state=iterator_state)
        if iterator_state and iterator_state["epoch"] == 2 \
                and iterator_state["steps_done"] == 1:
            shutil.copy(path, str(tmp_path / "preempt.pickle"))

    runner_mod.save_checkpoint = capture_save
    try:
        runner.train()
    finally:
        runner_mod.save_checkpoint = orig_save

    ckpt = tmp_path / "preempt.pickle"
    assert ckpt.exists()
    it = load_iterator_state(str(ckpt))
    assert it["epoch"] == 2 and it["steps_done"] == 1

    # Resume from the mid-epoch checkpoint; it must finish epoch 2 and
    # land on the same final params as the uninterrupted reference.
    resumed = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "b"),
                     train_data=data, valid_data=valid, quiet=True,
                     tensorboard=False, restore=str(ckpt))
    resumed.train()
    ref_leaves = jax.tree_util.tree_leaves(ref.state["params"])
    res_leaves = jax.tree_util.tree_leaves(resumed.state["params"])
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tf1_heads_fallback_for_new_task_ids():
    """Reference partial-restore semantics: task ids absent from a TF1
    checkpoint keep their freshly initialized heads instead of raising
    (chem_tensorflow.py:330-359 exempts task_ids from the config check
    so new heads can be trained on a restored model)."""
    import pytest

    from ggnn_tpu.compat.tf1 import heads_from_tf1

    w = {
        "out_layer_task0/regression_gate/MLP_W_layer0:0":
            np.ones((4, 1), np.float32),
        "out_layer_task0/regression_gate/MLP_b_layer0:0":
            np.zeros((1,), np.float32),
        "out_layer_task0/regression/MLP_W_layer0:0":
            np.ones((2, 1), np.float32),
        "out_layer_task0/regression/MLP_b_layer0:0":
            np.zeros((1,), np.float32),
    }
    sentinel = {"gate": "fresh_gate", "transform": "fresh_transform"}
    heads = heads_from_tf1(w, [0, 1], fallback={"task1": sentinel},
                           log=lambda *a: None)
    assert heads["task1"] is sentinel
    assert len(heads["task0"]["gate"]) == 1
    with pytest.raises(KeyError):
        heads_from_tf1(w, [0, 1])  # no fallback -> loud


def test_orbax_crash_window_recovery(tmp_path):
    """A crash between the staged save and the final rename must not
    lose the checkpoint: _load_payload falls back to the complete
    .tmp_new staging directory."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    import os

    from ggnn_tpu.training.checkpoint import (_load_payload,
                                              save_checkpoint)

    state = {"params": {"w": np.arange(6, dtype=np.float32)}}
    cfg = {"hidden_size": 4}
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint(path, cfg, state, 3, 1)
    # Simulate the crash window: the final rename never happened.
    os.rename(path, path + ".tmp_new")
    payload = _load_payload(path)
    assert payload["train_step"] == 3
    got = [np.asarray(v) for v in payload["weights"].values()]
    np.testing.assert_array_equal(got[0], np.arange(6, dtype=np.float32))


def test_resume_from_epoch_boundary_checkpoint(tmp_path):
    """A rolling checkpoint that lands exactly on the last step of an
    epoch must resume into the NEXT epoch (with the post-shuffle rng),
    not replay an all-skipped epoch and die with 'no batches produced'.
    Patience also restarts from the resumed epoch, not from 0."""
    import shutil

    import jax

    from ggnn_tpu.training import runner as runner_mod

    data = synthetic_molecules(60, seed=0)
    valid = synthetic_molecules(12, seed=1)
    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "patience": 1,'
        ' "edge_weight_dropout_keep_prob": 1.0,'
        ' "graph_state_dropout_keep_prob": 1.0}')

    ref = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "ref"),
                 train_data=data, valid_data=valid, quiet=True,
                 tensorboard=False)
    ref.train()

    runner = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "a"),
                    train_data=data, valid_data=valid, quiet=True,
                    tensorboard=False, checkpoint_every_steps=1)
    boundary = {}
    orig_save = runner_mod.save_checkpoint

    def capture_save(path, config, state, ts, vs, iterator_state=None):
        orig_save(path, config, state, ts, vs, iterator_state=iterator_state)
        if iterator_state and iterator_state["epoch"] == 1:
            # keep overwriting: the LAST capture of epoch 1 is the
            # boundary checkpoint (steps_done == total steps).
            shutil.copy(path, str(tmp_path / "boundary.pickle"))
            boundary["steps"] = iterator_state["steps_done"]

    runner_mod.save_checkpoint = capture_save
    try:
        runner.train()
    finally:
        runner_mod.save_checkpoint = orig_save

    ckpt = tmp_path / "boundary.pickle"
    assert ckpt.exists() and boundary["steps"] >= 1

    resumed = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "b"),
                     train_data=data, valid_data=valid, quiet=True,
                     tensorboard=False, restore=str(ckpt))
    log = resumed.train()  # used to raise RuntimeError
    assert len(log) >= 1
    ref_leaves = jax.tree_util.tree_leaves(ref.state["params"])
    res_leaves = jax.tree_util.tree_leaves(resumed.state["params"])
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_threaded_iterator_survives_abandoned_consumption():
    """Abandoning the consuming loop early (an exception mid-epoch) must
    retire the worker thread instead of leaving it parked on a full
    queue holding packed batches."""
    import threading

    from ggnn_tpu.utils.prefetch import ThreadedIterator

    before = threading.active_count()
    it = ThreadedIterator(iter(range(1, 100)), max_queue_size=2)
    for x in it:
        if x >= 3:
            break  # abandon: generator finally -> close()
    it.close()
    it._thread.join(timeout=5)
    assert not it._thread.is_alive()
    assert threading.active_count() <= before + 1


def test_tf1_converter_matches_dense_family_mode():
    """The blocked variant (and extended dense) uses the sparse-style
    {'layers': [...]} params tree, so its TF1 converter must route by
    mode — a dense-mode tree would be silently incompatible with the
    model's forward."""
    from ggnn_tpu.compat.tf1 import _dense_family_from_tf1
    from ggnn_tpu.training.config import default_params_for

    h = 4
    sparse_w = {}
    cfg_blocked = default_params_for("blocked")
    cfg_blocked["hidden_size"] = h
    t = 2
    for i in range(len(cfg_blocked["layer_timesteps"])):
        scope = f"graph_model/gnn_layer_{i}"
        sparse_w[f"{scope}/gnn_edge_weights_{i}"] = np.zeros((t * h, h),
                                                             np.float32)
        sparse_w[f"{scope}/timestep_0/gru_cell/gates/kernel"] = np.zeros(
            (2 * h, 2 * h), np.float32)
        sparse_w[f"{scope}/timestep_0/gru_cell/gates/bias"] = np.zeros(
            (2 * h,), np.float32)
        sparse_w[f"{scope}/timestep_0/gru_cell/candidate/kernel"] = \
            np.zeros((2 * h, h), np.float32)
        sparse_w[f"{scope}/timestep_0/gru_cell/candidate/bias"] = np.zeros(
            (h,), np.float32)
    out = _dense_family_from_tf1(sparse_w, cfg_blocked, t)
    assert "layers" in out and len(out["layers"]) == len(
        cfg_blocked["layer_timesteps"])


def test_tf1_heads_partial_presence_raises():
    """A PARTIALLY saved head (gate present, transform missing) must
    raise, not be silently replaced by fresh weights."""
    import pytest

    from ggnn_tpu.compat.tf1 import heads_from_tf1

    w = {
        "out_layer_task0/regression_gate/MLP_W_layer0:0":
            np.ones((4, 1), np.float32),
        "out_layer_task0/regression_gate/MLP_b_layer0:0":
            np.zeros((1,), np.float32),
        # transform MLP entirely missing
    }
    with pytest.raises(KeyError):
        heads_from_tf1(w, [0], fallback={"task0": {"gate": 0}},
                       log=lambda *a: None)


def test_mid_epoch_resume_exact_with_dropout(tmp_path):
    """Exact resume must hold WITH dropout active (round-5 review):
    only training steps consume the key chain (validation epochs —
    including the restore-time revalidation — draw nothing), so the
    resumed run's dropout stream replays the uninterrupted run's
    exactly and final params match bit-for-bit at float tolerance."""
    import shutil

    import jax
    from ggnn_tpu.training import runner as runner_mod
    from ggnn_tpu.training.checkpoint import load_iterator_state

    data = synthetic_molecules(60, seed=0)
    valid = synthetic_molecules(12, seed=1)
    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 2, "hidden_size": 16, "batch_size": 120,'
        ' "edge_weight_dropout_keep_prob": 0.8,'
        ' "out_layer_dropout_keep_prob": 0.8,'
        ' "graph_state_dropout_keep_prob": 0.9}')

    ref = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "ref"),
                 train_data=data, valid_data=valid, quiet=True,
                 tensorboard=False)
    ref.train()

    runner = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "a"),
                    train_data=data, valid_data=valid, quiet=True,
                    tensorboard=False, checkpoint_every_steps=1)
    orig_save = runner_mod.save_checkpoint

    def capture_save(path, config, state, ts, vs, iterator_state=None):
        orig_save(path, config, state, ts, vs,
                  iterator_state=iterator_state)
        if iterator_state and iterator_state["epoch"] == 2 \
                and iterator_state["steps_done"] == 1:
            shutil.copy(path, str(tmp_path / "preempt.pickle"))

    runner_mod.save_checkpoint = capture_save
    try:
        runner.train()
    finally:
        runner_mod.save_checkpoint = orig_save

    ckpt = tmp_path / "preempt.pickle"
    assert ckpt.exists()
    assert load_iterator_state(str(ckpt))["steps_done"] == 1
    resumed = Runner("sparse", dict(cfg), log_dir=str(tmp_path / "b"),
                     train_data=data, valid_data=valid, quiet=True,
                     tensorboard=False, restore=str(ckpt))
    resumed.train()
    for a, b in zip(jax.tree_util.tree_leaves(ref.state["params"]),
                    jax.tree_util.tree_leaves(resumed.state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dense_predict_returns_request_order(tmp_path):
    """Dense bucketing re-orders graphs internally; Runner.predict must
    scatter outputs back to REQUEST order (round-5 review — it used to
    return bucket order, silently attributing predictions to the wrong
    molecules). Oracle: per-graph single predictions."""
    cfg = resolve_config(
        "blocked", None,
        '{"num_epochs": 1, "hidden_size": 16, "batch_size": 4}')
    # Mix sizes so graphs land in different buckets.
    mols = synthetic_molecules(12, seed=9)
    runner = Runner("blocked", cfg, log_dir=str(tmp_path),
                    train_data=mols, valid_data=mols[:4], quiet=True,
                    tensorboard=False)
    runner.train()
    got = np.concatenate([np.asarray(o) for o in runner.predict(mols)],
                         axis=1)
    want = np.concatenate(
        [np.asarray(runner.predict([m])[0]) for m in mols], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_use_graph_false_predict_matches_training_semantics(tmp_path):
    """With the use_graph=False ablation, predict() must feed the
    readout ZEROED final states (what training optimized), not a
    forward pass through the never-trained graph params (round-5
    review). Oracle: outputs must be identical for two graphs with the
    same node-feature multiset but different edges."""
    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 16, "batch_size": 60,'
        ' "use_graph": false}')
    mols = synthetic_molecules(20, seed=4)
    runner = Runner("sparse", cfg, log_dir=str(tmp_path),
                    train_data=mols, valid_data=mols[:5], quiet=True,
                    tensorboard=False)
    runner.train()
    g = dict(synthetic_molecules(1, seed=42)[0])
    g2 = dict(g)
    g2["graph"] = [[0, 1, 1]]  # different topology, same features
    out1 = np.asarray(runner.predict([g])[0])
    out2 = np.asarray(runner.predict([g2])[0])
    np.testing.assert_allclose(out1, out2, rtol=0, atol=0)
