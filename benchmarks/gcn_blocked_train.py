"""`gcn_blocked` variant training-step throughput.

The edge-list GCN step (gcn_train.py) is scatter-latency-bound — 1.8% of
the MXU rate per roofline.py — so the GCN math is also offered on the
bucketed dense path (models/gcn.py:BlockedGCN, packing.preprocess_gcn_dense):
per layer, Â·H runs as a batched [B,V,V]@[B,V,H] contraction over
block-diagonal per-graph buckets. Same chained-scan methodology as
bench.py: stacked per-shape batch groups, fori_loop epochs, differenced
run lengths.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
from ggnn_tpu.data import packing
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.models.gcn import BlockedGCN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer


def tree_stack(batches):
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


data = synthetic_molecules(6400, seed=0)
cfg = default_params_for("gcn_blocked")
annotation = len(data[0]["node_features"][0])
rng = np.random.RandomState(0)
# Coarse buckets (2 compiled shapes), same policy as bench.py.
bucketed, bucket_sizes = packing.preprocess_gcn_dense(
    data, [0], {}, True, rng, bucket_sizes=np.array([16, 32]))
batches = list(packing.pack_dense_batches(
    bucketed, bucket_sizes, cfg["batch_size"], cfg["hidden_size"],
    annotation, True, rng, drop_remainder=False))
total_graphs = sum(int(b.num_graphs) for b in batches)
groups = {}
for b in batches:
    groups.setdefault(b.node_features.shape, []).append(b)
print(f"graphs={total_graphs} batches={len(batches)} shapes={len(groups)}",
      flush=True)

model = BlockedGCN(cfg)
key, k_graph, k_heads = jax.random.split(jax.random.PRNGKey(0), 3)
params = {"graph": model.init_params(k_graph),
          "heads": init_output_heads(k_heads, cfg["hidden_size"], [0])}
opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
state = {"params": params, "opt_state": opt.init(params)}


def loss_fn(p, bb, k):
    final = model.forward(p["graph"], bb, rng=k, is_training=True)
    computed = model.readout(p["heads"], [0], final, bb)
    return masked_regression_loss(computed, bb.targets, bb.target_mask,
                                  [0], {})[0]


def train_step(s, bb, k):
    loss, grads = jax.value_and_grad(loss_fn)(s["params"], bb, k)
    updates, os2 = opt.update(grads, s["opt_state"], s["params"])
    return {"params": jax.tree_util.tree_map(lambda p, u: p + u,
                                             s["params"], updates),
            "opt_state": os2}, loss


from ggnn_tpu.utils.timing import make_epochs_fn, time_epochs

stacked = [jax.device_put(tree_stack(g)) for g in groups.values()]
group_keys = [jax.device_put(jax.random.split(jax.random.fold_in(key, i),
                                              len(g)))
              for i, g in enumerate(groups.values())]
state = jax.device_put(state)
epochs_fn = make_epochs_fn(train_step)
t0 = time.time()
per_epoch, loss = time_epochs(epochs_fn, state, stacked, group_keys, 1, 26)
print(f"pilot epoch ~{per_epoch * 1e3:.2f}ms "
      f"(compile+pilot {time.time() - t0:.1f}s)", flush=True)
n2 = int(np.clip(15.0 / max(per_epoch, 1e-6), 26, 20000))
per_epoch, loss = time_epochs(epochs_fn, state, stacked, group_keys, 1, n2)
step_ms = per_epoch / len(batches) * 1e3
print(f"gcn_blocked  {step_ms:7.3f} ms/train-step avg  "
      f"({total_graphs / per_epoch:,.0f} graphs/s, loss {loss:.5f}, "
      f"n2={n2})", flush=True)
