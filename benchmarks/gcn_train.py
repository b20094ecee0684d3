"""GCN variant training-step throughput (chem_tensorflow_gcn.py analog).

Same honest chained-scan methodology as sparse_train_step.py: the whole
run is fori_loop'd on device, forced by a scalar fetch, and two run
lengths are differenced to cancel the tunnel's fixed latency.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from ggnn_tpu.data import packing
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.models.gcn import GCN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer

data = synthetic_molecules(2000, seed=0)
cfg = default_params_for("gcn"); cfg["batch_size"] = int(os.environ.get("GGNN_GCN_NODES", "20000"))
proc = packing.preprocess_gcn(data, [0], {}, True, np.random.RandomState(0))
caps = packing.plan_gcn_capacities(proc, cfg["batch_size"])
annotation = len(data[0]["node_features"][0])
batch = jax.device_put(next(packing.pack_gcn_batches(
    proc, cfg["batch_size"], caps, cfg["hidden_size"], annotation,
    False, None)))
ng = int(batch.num_graphs)
print(f"graphs={ng} nodes_cap={caps.nodes} edges_cap={caps.edges_per_type}",
      flush=True)

model = GCN(cfg)
key = jax.random.PRNGKey(0)
params = {"graph": model.init_params(key),
          "heads": init_output_heads(key, cfg["hidden_size"], [0])}
opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
state0 = {"params": params, "opt_state": opt.init(params)}

def loss_fn(p, bb, k):
    final = model.forward(p["graph"], bb, rng=k, is_training=True)
    computed = model.readout(p["heads"], [0], final, bb)
    return masked_regression_loss(computed, bb.targets, bb.target_mask,
                                  [0], {})[0]

def step(s, bb, k):
    loss, grads = jax.value_and_grad(loss_fn)(s["params"], bb, k)
    updates, os2 = opt.update(grads, s["opt_state"], s["params"])
    return {"params": jax.tree_util.tree_map(lambda p, u: p + u,
                                             s["params"], updates),
            "opt_state": os2}, loss

def run(s, n):
    def body(i, carry):
        s, _ = carry
        return step(s, batch, jax.random.fold_in(jax.random.PRNGKey(9), i))
    return jax.lax.fori_loop(0, n, body, (s, jnp.zeros(())))

g = jax.jit(run)
t0 = time.time(); _, l = g(state0, 1); float(l)
print(f"compile {time.time()-t0:.0f}s", flush=True)
t0 = time.time(); _, l = g(state0, 4); float(l); t1 = time.time()
# size the long run to ~2s of device work: the ~27ms tunnel RTT and
# shared-host jitter must stay <2% of the differenced window
n_long = 4 + max(32, int(2.0 / max((t1 - t0) / 4, 1e-4)))
t2 = time.time(); _, l = g(state0, n_long); float(l); t3 = time.time()
per = ((t3 - t2) - (t1 - t0)) / (n_long - 4)
print(f"gcn  {per*1e3:7.2f} ms/train-step  ({ng/per:,.0f} graphs/s)",
      flush=True)
