"""Hidden-size sweep: where bf16 starts winning on this hardware.

The reference config (H=100) is matmul-light, and bf16 measured neutral
there (benchmarks/README.md) — but production GNNs run wider, and the
MXU's bf16 advantage grows as H^2 against the O(H) gather traffic. This
sweeps hidden_size x compute_dtype and reports ms/step + graphs/s.

Usage: python benchmarks/hidden_sweep.py [blocked|sparse] [H ...]
  default: blocked 100 256 512 (each in float32 and bfloat16)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench import log, tree_stack
from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer
from ggnn_tpu.utils.timing import make_epochs_fn, time_epochs

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "blocked"
HS = [int(h) for h in sys.argv[2:]] or [100, 256, 512]
N_MOLS = 6400


def measure_blocked(hidden, dtype):
    from ggnn_tpu.models.dense_ggnn import DenseGGNN
    cfg = default_params_for("blocked")
    cfg.update({"hidden_size": hidden, "compute_dtype": dtype})
    data = synthetic_molecules(N_MOLS, seed=0)
    meta = infer_metadata([data], True)
    rng = np.random.RandomState(0)
    proc = native_pack.preprocess_dense_native(
        data, [0], {}, True, rng, bucket_sizes=np.array([16, 32]))
    adj_dtype = np.float32
    if dtype == "bfloat16":
        import ml_dtypes
        adj_dtype = np.dtype(ml_dtypes.bfloat16)
    batches = list(native_pack.pack_dense_batches_native(
        proc, cfg["batch_size"], hidden, meta.annotation_size,
        meta.num_edge_types, True, True, rng, drop_remainder=False,
        adjacency_dtype=adj_dtype))
    model = DenseGGNN(cfg, meta.num_edge_types)
    return _run(cfg, model, batches, hidden)


def measure_sparse(hidden, dtype):
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    cfg = default_params_for("sparse")
    cfg.update({"hidden_size": hidden, "compute_dtype": dtype,
                "batch_size": 20000,
                "edge_weight_dropout_keep_prob": 1.0})
    data = synthetic_molecules(N_MOLS, seed=0)
    meta = infer_metadata([data], True)
    proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, True, [0], {}, False)
    caps = native_pack.plan_capacities_native(proc, cfg["batch_size"])
    batches = list(native_pack.pack_sparse_batches_native(
        proc, meta.num_edge_types, True, cfg["batch_size"], caps, hidden,
        meta.annotation_size, False, None))
    model = SparseGGNN(cfg, meta.num_edge_types)
    return _run(cfg, model, batches, hidden)


def _run(cfg, model, batches, hidden):
    total_graphs = sum(int(b.num_graphs) for b in batches)
    groups = {}
    for b in batches:
        groups.setdefault(b.node_features.shape, []).append(b)
    key = jax.random.PRNGKey(0)
    params = {"graph": model.init_params(key),
              "heads": init_output_heads(key, hidden, [0])}
    opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
    state = {"params": params, "opt_state": opt.init(params)}

    def loss_fn(p, b, k):
        final = model.forward(p["graph"], b, rng=k, is_training=True)
        computed = model.readout(p["heads"], [0], final, b)
        return masked_regression_loss(computed, b.targets, b.target_mask,
                                      [0], {})[0]

    def train_step(s, b, k):
        loss, grads = jax.value_and_grad(loss_fn)(s["params"], b, k)
        updates, os2 = opt.update(grads, s["opt_state"], s["params"])
        return {"params": jax.tree_util.tree_map(
            lambda p, u: p + u, s["params"], updates),
            "opt_state": os2}, loss

    stacked = [jax.device_put(tree_stack(g)) for g in groups.values()]
    gkeys = [jax.device_put(jax.random.split(jax.random.fold_in(key, i),
                                             len(g)))
             for i, g in enumerate(groups.values())]
    state = jax.device_put(state)
    epochs_fn = make_epochs_fn(train_step)
    per_epoch, loss = time_epochs(epochs_fn, state, stacked, gkeys, 1, 26)
    n2 = int(np.clip(4.0 / max(per_epoch, 1e-6), 26, 20000))
    per_epoch, loss = time_epochs(epochs_fn, state, stacked, gkeys, 1, n2)
    return per_epoch, total_graphs, loss


def main():
    measure = measure_blocked if VARIANT == "blocked" else measure_sparse
    rows = []
    for hidden in HS:
        for dtype in ("float32", "bfloat16"):
            per_epoch, total_graphs, loss = measure(hidden, dtype)
            gps = total_graphs / per_epoch
            rows.append((hidden, dtype, per_epoch * 1e3, gps))
            log(f"{VARIANT} H={hidden:4d} {dtype:9s}: epoch "
                f"{per_epoch*1e3:8.2f}ms -> {gps:10,.0f} graphs/s "
                f"(loss {loss:.5f})")
    print(f"\n| H | dtype | epoch ms | graphs/s |")
    print("|---|---|---|---|")
    for hidden, dtype, ms, gps in rows:
        print(f"| {hidden} | {dtype} | {ms:.2f} | {gps:,.0f} |")


if __name__ == "__main__":
    main()
