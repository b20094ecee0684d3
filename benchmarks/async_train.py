"""Async (DAG-scheduled) GGNN training-step timing on TPU."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from ggnn_tpu.data.async_schedule import (plan_async_capacities,
                                          pack_async_batches,
                                          preprocess_async)
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.async_ggnn import AsyncGGNN
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.optimizer import make_optimizer

cfg = default_params_for("async")
cfg["async_compact"] = os.environ.get("GGNN_ASYNC_COMPACT", "1") == "1"
_remat = os.environ.get("GGNN_ASYNC_REMAT")  # unset = model auto-policy
if _remat is not None:
    cfg["async_remat"] = _remat == "1"
cfg["num_nodes"] = int(os.environ.get("GGNN_ASYNC_NODES", "20000"))
cfg["propagation_substeps"] = 40
data = synthetic_molecules(int(os.environ.get("GGNN_ASYNC_MOLS", "2000")), seed=0)
meta = infer_metadata([data], True)
proc = preprocess_async(data, meta.num_edge_types, True,
                        cfg["propagation_rounds"],
                        cfg["propagation_substeps"], [0], {}, False)
caps = plan_async_capacities(proc, meta.num_edge_types, cfg["num_nodes"],
                             cfg["propagation_rounds"])
b = jax.device_put(next(pack_async_batches(
    proc, meta.num_edge_types, cfg["num_nodes"], caps,
    cfg["propagation_rounds"], cfg["propagation_substeps"],
    cfg["hidden_size"], meta.annotation_size, False)))
ng = int(b.num_graphs)
print(f"{int(b.num_nodes)} nodes, {ng} graphs", flush=True)

model = AsyncGGNN(cfg, meta.num_edge_types)
key = jax.random.PRNGKey(0)
params = {"graph": model.init_params(key),
          "heads": init_output_heads(key, cfg["hidden_size"], [0])}
opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
state0 = {"params": params, "opt_state": opt.init(params)}

def loss_fn(p, k):
    final = model.forward(p["graph"], b, rng=k, is_training=True)
    computed = model.readout(p["heads"], [0], final, b)
    return masked_regression_loss(computed, b.targets, b.target_mask,
                                  [0], {})[0]

def step(s, i):
    loss, grads = jax.value_and_grad(loss_fn)(
        s["params"], jax.random.fold_in(jax.random.PRNGKey(7), i))
    updates, os2 = opt.update(grads, s["opt_state"], s["params"])
    return {"params": jax.tree_util.tree_map(lambda p, u: p + u,
                                             s["params"], updates),
            "opt_state": os2}, loss

def run(s, n):
    def body(i, carry):
        s, _ = carry
        return step(s, i)
    return jax.lax.fori_loop(0, n, body, (s, jnp.zeros(())))

g = jax.jit(run)
t0 = time.time(); _, l = g(state0, 1); float(l)
print(f"compile {time.time()-t0:.0f}s", flush=True)
t0 = time.time(); _, l = g(state0, 3); float(l); t1 = time.time()
# size the long run to ~2s of device work so the ~27ms tunnel RTT
# and shared-host jitter stay <2% of the differenced window
n_long = 3 + max(16, int(2.0 / max((t1 - t0) / 3, 1e-4)))
t2 = time.time(); _, l = g(state0, n_long); float(l); t3 = time.time()
per = ((t3 - t2) - (t1 - t0)) / (n_long - 3)
path = "compact" if cfg["async_compact"] else "plain"
print(f"async[{path}] {per*1e3:7.2f} ms/train-step ({ng/per:,.0f} graphs/s)",
      flush=True)
