import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from ggnn_tpu.data import packing
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.models.sparse_ggnn import SparseGGNN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer

# Round 2: the `ell`/`ell16`/`sorted` modes were retired along with the
# ELL config surface — the packer's target-sorted layout (always on) IS
# the sorted path, and the Pallas kernel measured at parity with it
# (archived: ops/pallas/ell_spmm.py, benchmarks/README.md).
mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
data = synthetic_molecules(2000, seed=0)
base = default_params_for("sparse"); base["batch_size"] = 20000
meta = infer_metadata([data], True)
proc = packing.preprocess_sparse(data, meta.num_edge_types, True, [0], {}, True, np.random.RandomState(0))
caps = packing.plan_capacities(proc, meta.num_edge_types, base["batch_size"])
b = jax.device_put(next(packing.pack_sparse_batches(proc, meta.num_edge_types, base["batch_size"], caps, 100, meta.annotation_size, False, None)))
ng = int(b.num_graphs)
print(f"graphs={ng}", flush=True)

over = {"xla": {}, "bf16": {"compute_dtype": "bfloat16"}}[mode]
cfg = {**base, **over}
model = SparseGGNN(cfg, meta.num_edge_types)
key = jax.random.PRNGKey(0)
params = {"graph": model.init_params(key), "heads": init_output_heads(key, 100, [0])}
opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
state0 = {"params": params, "opt_state": opt.init(params)}
def loss_fn(p, bb, k):
    final = model.forward(p["graph"], bb, rng=k, is_training=True)
    computed = model.readout(p["heads"], [0], final, bb)
    return masked_regression_loss(computed, bb.targets, bb.target_mask, [0], {})[0]
def step(s, bb, k):
    loss, grads = jax.value_and_grad(loss_fn)(s["params"], bb, k)
    updates, os2 = opt.update(grads, s["opt_state"], s["params"])
    return {"params": jax.tree_util.tree_map(lambda p,u: p+u, s["params"], updates), "opt_state": os2}, loss
def run(s, n):
    def body(i, carry):
        s, _ = carry
        return step(s, b, jax.random.fold_in(jax.random.PRNGKey(9), i))
    return jax.lax.fori_loop(0, n, body, (s, jnp.zeros(())))
g = jax.jit(run)
t0=time.time(); _, l = g(state0, 1); float(l); print(f"compile {time.time()-t0:.0f}s", flush=True)
t0=time.time(); _, l = g(state0, 4); float(l); t1=time.time()
# ~2s of device work so the ~27ms tunnel RTT stays <2% of the window
n_long = 4 + max(32, int(2.0 / max((t1 - t0) / 4, 1e-4)))
t2=time.time(); _, l = g(state0, n_long); float(l); t3=time.time()
per = ((t3-t2)-(t1-t0))/(n_long-4)
print(f"{mode:8s} {per*1e3:7.2f} ms/train-step  ({ng/per:,.0f} graphs/s)", flush=True)
