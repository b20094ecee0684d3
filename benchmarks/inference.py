"""Forward-only (serving) throughput: sparse XLA vs Pallas blocked-ELL.

The ELL kernel's niche is inference on packed batches too large to
bucket densely: no autodiff residual traffic, so its forward win
survives end-to-end. Measures full 8-step forward + gated readout.

Run on the TPU: python benchmarks/inference.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from ggnn_tpu.data import native_pack
from ggnn_tpu.data.loader import infer_metadata
from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.models.base import init_output_heads
from ggnn_tpu.models.sparse_ggnn import SparseGGNN
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.utils.padding import round_up


def main():
    base = default_params_for("sparse")
    base.update({"batch_size": 20000, "edge_weight_dropout_keep_prob": 1.0})
    data = synthetic_molecules(2000, seed=0)
    meta = infer_metadata([data], True)
    proc = native_pack.preprocess_sparse_native(
        data, meta.num_edge_types, True, [0], {}, False)
    caps = native_pack.plan_capacities_native(proc, base["batch_size"])
    batch = jax.device_put(next(native_pack.pack_sparse_batches_native(
        proc, meta.num_edge_types, True, base["batch_size"], caps,
        base["hidden_size"], meta.annotation_size, False, None)))
    ng = int(batch.num_graphs)
    print(f"batch: {int(batch.num_nodes)} nodes, {ng} graphs", flush=True)

    def bench(name, over):
        cfg = {**base, **over}
        model = SparseGGNN(cfg, meta.num_edge_types)
        key = jax.random.PRNGKey(0)
        params = {"graph": model.init_params(key),
                  "heads": init_output_heads(key, cfg["hidden_size"], [0])}

        def fwd(p, b):
            final = model.forward(p["graph"], b)
            return model.readout(p["heads"], [0], final, b)

        import dataclasses

        def run(p, b, n):
            def body(i, acc):
                # True data dependence between iterations so XLA cannot
                # hoist the loop-invariant forward out of the loop.
                b2 = dataclasses.replace(
                    b, node_features=b.node_features + acc * 1e-20)
                return fwd(p, b2).sum()
            return jax.lax.fori_loop(0, n, body, 0.0)

        g = jax.jit(run)
        float(g(params, batch, 1))
        t0 = time.time(); float(g(params, batch, 4)); t1 = time.time()
        t2 = time.time(); float(g(params, batch, 36)); t3 = time.time()
        per = ((t3 - t2) - (t1 - t0)) / 32
        print(f"{name:24s} {per*1e3:7.2f} ms/forward  "
              f"({ng/per:,.0f} graphs/s)", flush=True)

    bench("combined lane", {})
    bench("per-type lanes", {"combined_edge_lanes": False})
    bench("combined + bf16", {"compute_dtype": "bfloat16"})


if __name__ == "__main__":
    main()
