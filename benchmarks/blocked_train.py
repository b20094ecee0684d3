"""Measure the blocked (featureful dense-path) variant honestly on TPU."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.models.dense_ggnn import DenseGGNN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer
from ggnn_tpu.utils.timing import make_epochs_fn, time_epochs
from bench import tree_stack, log

cfg = default_params_for("blocked")
data = synthetic_molecules(25600, seed=0)
meta = infer_metadata([data], True)
rng = np.random.RandomState(0)
proc = native_pack.preprocess_dense_native(data, [0], {}, True, rng, bucket_sizes=np.array([16, 32]))
batches = list(native_pack.pack_dense_batches_native(proc, cfg["batch_size"], cfg["hidden_size"], meta.annotation_size, meta.num_edge_types, True, True, rng, drop_remainder=False))
total_graphs = sum(int(b.num_graphs) for b in batches)
groups = {}
for b in batches:
    groups.setdefault(b.node_features.shape, []).append(b)
log(f"{total_graphs} graphs, {len(batches)} batches, {len(groups)} shapes")

model = DenseGGNN(cfg, meta.num_edge_types)
key = jax.random.PRNGKey(0)
params = {"graph": model.init_params(key), "heads": init_output_heads(key, cfg["hidden_size"], [0])}
opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
state = {"params": params, "opt_state": opt.init(params)}

def loss_fn(p, b, k):
    final = model.forward(p["graph"], b, rng=k, is_training=True)
    computed = model.readout(p["heads"], [0], final, b)
    return masked_regression_loss(computed, b.targets, b.target_mask, [0], {})[0]

def train_step(s, b, k):
    loss, grads = jax.value_and_grad(loss_fn)(s["params"], b, k)
    updates, os2 = opt.update(grads, s["opt_state"], s["params"])
    return {"params": jax.tree_util.tree_map(lambda p, u: p + u, s["params"], updates), "opt_state": os2}, loss

stacked = [jax.device_put(tree_stack(g)) for g in groups.values()]
gkeys = [jax.device_put(jax.random.split(jax.random.fold_in(key, i), len(g))) for i, g in enumerate(groups.values())]
state = jax.device_put(state)
epochs_fn = make_epochs_fn(train_step)
per_epoch, loss = time_epochs(epochs_fn, state, stacked, gkeys, 1, 26)
n2 = int(np.clip(15.0 / max(per_epoch, 1e-6), 26, 20000))
per_epoch, loss = time_epochs(epochs_fn, state, stacked, gkeys, 1, n2)
print(f"blocked variant: epoch {per_epoch*1e3:.2f}ms -> {total_graphs/per_epoch:,.0f} graphs/s (loss {loss:.5f})", flush=True)
