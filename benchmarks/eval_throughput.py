"""Dense-path EVAL (validation) epoch throughput vs the reference valid
headline (README.md:67, 9902.71 instances/sec): forward + masked loss
only, same corpus/buckets/methodology as bench.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads, masked_regression_loss
from ggnn_tpu.models.dense_ggnn import DenseGGNN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.utils.timing import make_epochs_fn, time_epochs

cfg = default_params_for("dense")
data = synthetic_molecules(25600, seed=0)
meta = infer_metadata([data], cfg["tie_fwd_bkwd"])
rng = np.random.RandomState(0)
proc = native_pack.preprocess_dense_native(data, cfg["task_ids"], {}, True, rng, bucket_sizes=np.array([16,32]))
batches = list(native_pack.pack_dense_batches_native(proc, cfg["batch_size"], cfg["hidden_size"],
    meta.annotation_size, meta.num_edge_types, cfg["tie_fwd_bkwd"], True, rng))
total = sum(int(b.num_graphs) for b in batches)
groups = {}
for b in batches: groups.setdefault(b.node_features.shape, []).append(b)
model = DenseGGNN(cfg, meta.num_edge_types)
key, kg, kh = jax.random.split(jax.random.PRNGKey(0), 3)
params = {"graph": model.init_params(kg), "heads": init_output_heads(kh, cfg["hidden_size"], cfg["task_ids"])}

def eval_step(state, batch, rng_key):
    # The loss ACCUMULATES into the carry: a pass-through carry would
    # leave every batch's forward dead (the harness consumes only the
    # last loss) and XLA eliminates the whole epoch — measured 9.6x
    # "too fast" before this line existed.
    final = model.forward(state["p"]["graph"], batch)
    computed = model.readout(state["p"]["heads"], cfg["task_ids"], final, batch)
    loss, _ = masked_regression_loss(computed, batch.targets, batch.target_mask, cfg["task_ids"], {})
    state = {"p": state["p"], "acc": state["acc"] + loss}
    return state, state["acc"]

import jax.tree_util as jtu
stacked = [jax.device_put(jtu.tree_map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *g)) for g in groups.values()]
gkeys = [jax.device_put(jax.random.split(jax.random.fold_in(key, i), len(g))) for i, g in enumerate(groups.values())]
state = jax.device_put({"p": params, "acc": jnp.zeros(())})
fn = make_epochs_fn(eval_step)
per, loss = time_epochs(fn, state, stacked, gkeys, 1, 26)
n2 = int(np.clip(10.0/per, 26, 40000))
per, loss = time_epochs(fn, state, stacked, gkeys, 1, n2)
print(f"dense EVAL epoch {per*1e3:.2f}ms -> {total/per:.0f} graphs/s (vs reference valid 9902.71: {total/per/9902.71:.1f}x)")
