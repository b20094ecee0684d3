"""Generate TF1 golden fixtures by EXECUTING the reference code.

For each fixture case this script:
  1. writes a deterministic synthetic corpus (ggnn_tpu.data.synthetic)
     to a temp dir in the reference JSON schema;
  2. constructs the actual reference model (imported read-only from
     /root/reference) under tf.compat.v1 via refshim;
  3. dumps all variables, runs a deterministic validation epoch, fetches
     the final node representations + per-graph output on the first
     batch, then applies ONE Adam train step on that same batch and
     dumps the post-step weights;
  4. writes everything to tests/fixtures/tf1/<case>.npz (+ config in a
     JSON sidecar inside the npz as a string array).

tests/test_tf1_golden.py replays each case through ggnn_tpu with the
imported weights and pins allclose agreement. Regenerate with:
    python tools/tf1_golden/generate.py [case ...]
(needs tensorflow>=2 + tf_keras; no network).
"""

import contextlib
import io
import json
import os
import sys
import shutil
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

from refshim import install_tf1_shim  # noqa: E402

tf = install_tf1_shim()

from ggnn_tpu.data.synthetic import (  # noqa: E402
    async_fixture_molecules,
    synthetic_molecules,
)

FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures", "tf1")

# Cases that additionally dump weights after TRAJECTORY_STEPS Adam steps
# on the first valid batch (all keep-probs 1.0, so fully deterministic).
TRAJECTORY_STEPS = 10
TRAJECTORY_CASES = ("sparse_default", "dense_default", "async_default",
                    "gcn_default")

# keep-probs pinned to 1.0 so every fixture (including the Adam step) is
# deterministic; everything else is the reference default unless stated.
_DETERMINISTIC = {
    "edge_weight_dropout_keep_prob": 1.0,
    "graph_state_dropout_keep_prob": 1.0,
    "out_layer_dropout_keep_prob": 1.0,
    "random_seed": 7,
    "num_epochs": 1,
}

CASES = {
    # Default sparse GGNN (GRU/tanh, residuals {"2":[0],"4":[0,2]},
    # avg aggregation on) — chem_tensorflow_sparse.py defaults.
    "sparse_default": {
        "variant": "sparse",
        "corpus": dict(n_train=24, n_valid=12, seed=31, num_targets=1),
        "config": {"hidden_size": 16},
    },
    # Attention + edge bias + sum aggregation (the featureful flags).
    "sparse_attention_bias": {
        "variant": "sparse",
        "corpus": dict(n_train=20, n_valid=10, seed=32, num_targets=1),
        "config": {"hidden_size": 16, "use_propagation_attention": True,
                   "use_edge_bias": True,
                   "use_edge_msg_avg_aggregation": False},
    },
    # Per-step granularity: single layer, 1 and 3 timesteps.
    "sparse_one_step": {
        "variant": "sparse",
        "corpus": dict(n_train=10, n_valid=8, seed=33, num_targets=1),
        "config": {"hidden_size": 16, "layer_timesteps": [1],
                   "residual_connections": {}},
    },
    "sparse_three_steps": {
        "variant": "sparse",
        "corpus": dict(n_train=10, n_valid=8, seed=33, num_targets=1),
        "config": {"hidden_size": 16, "layer_timesteps": [3],
                   "residual_connections": {}},
    },
    # The README R-GCN recipe (README.md:48-52).
    "rgcn": {
        "variant": "sparse",
        "corpus": dict(n_train=16, n_valid=8, seed=34, num_targets=1),
        "config": {"hidden_size": 16, "use_edge_bias": False,
                   "use_edge_msg_avg_aggregation": True,
                   "residual_connections": {},
                   "layer_timesteps": [1] * 8,
                   "graph_rnn_cell": "RNN",
                   "graph_rnn_activation": "ReLU"},
    },
    # --freeze-graph-model: Adam step must leave the graph subtree
    # untouched and update only the output heads
    # (chem_tensorflow.py:174-182).
    "sparse_freeze": {
        "variant": "sparse",
        "corpus": dict(n_train=12, n_valid=8, seed=39, num_targets=1),
        "config": {"hidden_size": 16, "layer_timesteps": [2],
                   "residual_connections": {}},
        "args": {"--freeze-graph-model": True},
    },
    # Multitask masking (two targets).
    "sparse_multitask": {
        "variant": "sparse",
        "corpus": dict(n_train=16, n_valid=8, seed=35, num_targets=2),
        "config": {"hidden_size": 16, "task_ids": [0, 1]},
    },
    # Dense GGNN defaults (bucketing, GRU shared over 4 timesteps,
    # edge bias on).
    # Small batch size so every bucket yields at least one full batch
    # (the reference's floor-division remainder drop would otherwise
    # leave zero batches on a tiny corpus, chem_tensorflow_dense.py:160).
    "dense_default": {
        "variant": "dense",
        "corpus": dict(n_train=40, n_valid=30, seed=36, num_targets=1),
        "config": {"hidden_size": 16, "batch_size": 4},
    },
    # Async GGNN on the quirk-dormant corpus (data/synthetic.py:
    # async_fixture_molecules): propagation_rounds=2 keeps the seed
    # tuple-indexing bug (chem_tensorflow_async.py:308) unreachable,
    # num_nodes=12 packs ONE graph per batch so the per-type msg-target
    # offset bug (async.py:399-401) is inert, and the unique-min-degree
    # construction makes both schedule compilers pick the same DFS seed.
    # The replay (tests/test_tf1_golden.py) mirrors the remaining type
    # off-by-one (async.py:264-266) with a shifted corpus + zero-weight
    # extra slot.
    "async_default": {
        "variant": "async",
        "corpus": dict(n_train=12, n_valid=8, seed=51, num_targets=1,
                       kind="async_fixture"),
        "config": {"hidden_size": 16, "propagation_rounds": 2,
                   "propagation_substeps": 15, "num_nodes": 12},
    },
    # Edge bias + BasicRNN/ReLU cell (the other async weight/cell paths).
    "async_bias_rnn": {
        "variant": "async",
        "corpus": dict(n_train=10, n_valid=6, seed=53, num_targets=1,
                       kind="async_fixture"),
        "config": {"hidden_size": 16, "propagation_rounds": 2,
                   "propagation_substeps": 15, "num_nodes": 12,
                   "use_edge_bias": True, "graph_rnn_cell": "RNN",
                   "graph_rnn_activation": "ReLU"},
    },
    # GCN with and without bias.
    "gcn_default": {
        "variant": "gcn",
        "corpus": dict(n_train=16, n_valid=10, seed=37, num_targets=1),
        "config": {"hidden_size": 16},
    },
    "gcn_bias": {
        "variant": "gcn",
        "corpus": dict(n_train=16, n_valid=10, seed=38, num_targets=1),
        "config": {"hidden_size": 16, "gcn_use_bias": True},
    },
}


def _model_class(variant):
    if variant == "sparse":
        from chem_tensorflow_sparse import SparseGGNNChemModel
        return SparseGGNNChemModel
    if variant == "dense":
        from chem_tensorflow_dense import DenseGGNNChemModel
        return DenseGGNNChemModel
    if variant == "gcn":
        from chem_tensorflow_gcn import SparseGCNChemModel
        return SparseGCNChemModel
    if variant == "async":
        from chem_tensorflow_async import AsyncGGNNChemModel
        return AsyncGGNNChemModel
    raise ValueError(variant)


def _corpus_fn(corpus: dict):
    if corpus.get("kind") == "async_fixture":
        return async_fixture_molecules
    return synthetic_molecules


def generate_case(name: str, spec: dict) -> None:
    corpus = spec["corpus"]
    config = dict(_DETERMINISTIC)
    config.update(spec["config"])

    workdir = tempfile.mkdtemp(prefix=f"tf1_golden_{name}_")
    try:
        _generate_case_in(workdir, name, spec, corpus, config)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _generate_case_in(workdir: str, name: str, spec: dict, corpus: dict,
                      config: dict) -> None:
    make = _corpus_fn(corpus)
    train = make(corpus["n_train"], seed=corpus["seed"],
                 num_targets=corpus["num_targets"])
    valid = make(corpus["n_valid"], seed=corpus["seed"] + 1,
                 num_targets=corpus["num_targets"])
    with open(os.path.join(workdir, "molecules_train.json"), "w") as f:
        json.dump(train, f)
    with open(os.path.join(workdir, "molecules_valid.json"), "w") as f:
        json.dump(valid, f)

    tf.reset_default_graph()
    cls = _model_class(spec["variant"])
    args = {"--config": json.dumps(config),
            "--data_dir": workdir,
            "--log_dir": os.path.join(workdir, "logs")}
    args.update(spec.get("args", {}))
    quiet = io.StringIO()
    with contextlib.redirect_stdout(quiet):
        model = cls(args)

        with model.graph.as_default():
            variables = {v.name: model.sess.run(v)
                         for v in tf.global_variables()
                         if "Adam" not in v.name
                         and not v.name.startswith("beta")}

        # Deterministic validation epoch over the whole valid split.
        loss, accuracies, error_ratios, _, steps = model.run_epoch(
            "golden", model.valid_data, False)

        # First valid batch: final node states + per-graph output.
        feed = next(iter(model.make_minibatch_iterator(
            model.valid_data, False)))
        feed[model.placeholders["out_layer_dropout_keep_prob"]] = 1.0
        fetches = [model.ops["final_node_representations"]]
        if hasattr(model, "output"):  # gcn/async never cache self.output
            fetches.append(model.output)
        elif spec["variant"] == "async":
            # async gated_regression's per-graph readout (the LAST
            # task's, matching the sparse self.output convention).
            last_task = config.get("task_ids", [0])[-1]
            fetches.append(model.graph.get_tensor_by_name(
                f"out_layer_task{last_task}/Squeeze:0"))
        fetched = model.sess.run(fetches, feed_dict=feed)
        final_states = fetched[0]
        output = fetched[1] if len(fetched) > 1 else np.zeros((0,))
        batch_num_graphs = int(feed[model.placeholders["num_graphs"]])

        # Async: also pin the per-round node states (each round's
        # TensorArray stack, chem_tensorflow_async.py:216).
        round_states = []
        if spec["variant"] == "async":
            round_tensors = [
                model.graph.get_tensor_by_name(
                    "graph_model/prop_round%i/state_stack_round%i/"
                    "state_stack_round%i:0" % (r, r, r))
                for r in range(config["propagation_rounds"])]
            round_states = model.sess.run(round_tensors, feed_dict=feed)

        # Pre-clip gradient fetch for the trajectory cases: the recorded
        # per-step gradients are replayed through this framework's
        # clip->Adam chain in tests, pinning OPTIMIZER semantics alone
        # with a tight tolerance (no forward/backward f32 noise, which
        # Adam's scale-invariant normalization otherwise amplifies to
        # O(lr) per step on near-zero-gradient elements).
        grad_ops, tvar_names = None, None
        if name in TRAJECTORY_CASES:
            with model.graph.as_default():
                tvars = tf.trainable_variables()
                tvar_names = [v.name for v in tvars]
                grad_ops = tf.gradients(model.ops["loss"], tvars)

        traj_grads = {}

        def fetch_grads(step_idx):
            if grad_ops is None:
                return
            vals = model.sess.run(grad_ops, feed_dict=feed)
            for vname, g in zip(tvar_names, vals):
                traj_grads[f"gt{step_idx}/{vname}"] = (
                    np.zeros((), np.float32) if g is None
                    else np.asarray(g, np.float32))

        # One Adam train step on that same deterministic batch.
        fetch_grads(1)
        model.sess.run(model.ops["train_step"], feed_dict=feed)
        with model.graph.as_default():
            post = {v.name: model.sess.run(v)
                    for v in tf.global_variables()
                    if "Adam" not in v.name and not v.name.startswith("beta")}

        # Training-TRAJECTORY golden: keep stepping on the same batch to
        # TRAJECTORY_STEPS total Adam steps. Optimizer-semantics drift
        # (bias-correction step indexing, epsilon placement, clip order)
        # that a single step can't expose compounds here
        # (chem_tensorflow.py:172-193).
        traj = {}
        if name in TRAJECTORY_CASES:
            for k in range(2, TRAJECTORY_STEPS + 1):
                fetch_grads(k)
                model.sess.run(model.ops["train_step"], feed_dict=feed)
            with model.graph.as_default():
                traj = {v.name: model.sess.run(v)
                        for v in tf.global_variables()
                        if "Adam" not in v.name
                        and not v.name.startswith("beta")}
        model.sess.close()

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    payload = {
        "meta": np.array(json.dumps({
            "case": name,
            "variant": spec["variant"],
            "freeze_graph_model": bool(
                spec.get("args", {}).get("--freeze-graph-model")),
            "corpus": corpus,
            "config": config,
            "num_edge_types": model.num_edge_types,
            "annotation_size": model.annotation_size,
            "max_num_vertices": model.max_num_vertices,
            "valid_loss": float(loss),
            "valid_accuracies": [float(a) for a in np.atleast_1d(accuracies)],
            "valid_error_ratios": [float(e)
                                   for e in np.atleast_1d(error_ratios)],
            "valid_steps": int(steps),
            "batch_num_graphs": batch_num_graphs,
            "trajectory_steps": (TRAJECTORY_STEPS
                                 if name in TRAJECTORY_CASES else 0),
            "tf_version": tf.VERSION,
        })),
        "final_states": np.asarray(final_states, np.float32),
        "output": np.asarray(output, np.float32),
    }
    for r, states in enumerate(round_states):
        payload[f"round_states_{r}"] = np.asarray(states, np.float32)
    for k, v in variables.items():
        payload["w/" + k] = np.asarray(v)
    for k, v in post.items():
        payload["p/" + k] = np.asarray(v)
    for k, v in traj.items():
        payload["t/" + k] = np.asarray(v)
    payload.update(traj_grads)
    out = os.path.join(FIXTURE_DIR, f"{name}.npz")
    np.savez_compressed(out, **payload)
    print(f"{name}: wrote {out} "
          f"(loss={loss:.6f} acc={np.atleast_1d(accuracies)} "
          f"V={final_states.shape})")


def main():
    wanted = sys.argv[1:] or list(CASES)
    unknown = [n for n in wanted if n not in CASES]
    if unknown:
        raise SystemExit(
            f"unknown case(s) {unknown}; available: {sorted(CASES)}")
    for name in wanted:
        generate_case(name, CASES[name])


if __name__ == "__main__":
    main()
