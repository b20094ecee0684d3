"""Benchmark: dense-GGNN training throughput (the reference's headline).

The reference publishes one number: 6758.04 train instances/sec for the
dense GGNN with default hyperparameters on QM9 (README.md:66, TF 1.3,
2018-era host). This bench reproduces that workload shape — QM9-sized
synthetic molecules (no network/rdkit dependency), default dense config
(hidden 100, 4 timesteps, 256 graphs/batch, bucketed padding, Adam +
per-leaf clip) — and measures steady-state training throughput on the
current default JAX platform (one TPU chip under the driver).

Prints ONE JSON line to stdout; progress goes to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_INSTANCES_PER_SEC = 6758.04  # reference README.md:66


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_bench(jax, smoke: bool = False):
    from ggnn_tpu.data import packing
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
    from ggnn_tpu.models.dense_ggnn import DenseGGNN
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.optimizer import make_optimizer

    cfg = default_params_for("dense")
    n_mols = 2560 if smoke else 25600
    log(f"platform: {jax.default_backend()}  devices: {jax.devices()}")

    t0 = time.time()
    data = synthetic_molecules(n_mols, seed=0)
    meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
    rng = np.random.RandomState(0)
    bucketed, bucket_sizes = packing.preprocess_dense(
        data, meta.num_edge_types, cfg["tie_fwd_bkwd"], cfg["task_ids"],
        cfg["task_sample_ratios"], True, rng)
    batches = list(packing.pack_dense_batches(
        bucketed, bucket_sizes, cfg["batch_size"], cfg["hidden_size"],
        meta.annotation_size, True, rng))
    total_graphs = sum(int(b.num_graphs) for b in batches)
    log(f"packed {total_graphs} graphs into {len(batches)} batches "
        f"in {time.time() - t0:.1f}s "
        f"({len(set(b.node_features.shape for b in batches))} shapes)")

    model = DenseGGNN(cfg, meta.num_edge_types)
    key = jax.random.PRNGKey(0)
    params = {
        "graph": model.init_params(key),
        "heads": init_output_heads(key, cfg["hidden_size"], cfg["task_ids"]),
    }
    optimizer = make_optimizer(cfg["learning_rate"],
                               cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": optimizer.init(params)}
    task_ids = list(cfg["task_ids"])

    def loss_fn(params, batch, rng_key):
        final = model.forward(params["graph"], batch, rng=rng_key,
                              is_training=True)
        computed = model.readout(params["heads"], task_ids, final, batch)
        loss, accs = masked_regression_loss(
            computed, batch.targets, batch.target_mask, task_ids,
            cfg["task_sample_ratios"])
        return loss, accs

    @jax.jit
    def train_step(state, batch, rng_key):
        (loss, accs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng_key)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state["params"], updates)
        return {"params": new_params, "opt_state": opt_state}, loss

    t0 = time.time()
    device_batches = [jax.device_put(b) for b in batches]
    keys = jax.device_put(jax.random.split(key, len(batches)))
    log(f"device_put in {time.time() - t0:.1f}s")

    # Warmup epoch: compiles one executable per bucket shape.
    t0 = time.time()
    for b, k in zip(device_batches, keys):
        state, loss = train_step(state, b, k)
    jax.block_until_ready(loss)
    log(f"warmup epoch (compile) {time.time() - t0:.1f}s, "
        f"loss={float(loss):.5f}")

    # Timed: steady-state epochs, async dispatch, one final sync.
    n_epochs = 1 if smoke else 3
    t0 = time.time()
    for _ in range(n_epochs):
        for b, k in zip(device_batches, keys):
            state, loss = train_step(state, b, k)
    jax.block_until_ready(loss)
    elapsed = time.time() - t0
    instances_per_sec = n_epochs * total_graphs / elapsed
    log(f"{n_epochs} epochs x {total_graphs} graphs in {elapsed:.2f}s "
        f"-> {instances_per_sec:.1f} graphs/s, final loss {float(loss):.5f}")

    print(json.dumps({
        "metric": "dense_ggnn_train_throughput",
        "value": round(instances_per_sec, 2),
        "unit": "graphs/s",
        "vs_baseline": round(instances_per_sec / BASELINE_INSTANCES_PER_SEC,
                             2),
    }))


if __name__ == "__main__":
    import jax
    run_bench(jax, smoke="--smoke" in sys.argv)
