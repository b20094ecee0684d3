"""Batch-of-one inference latency (serving path).

Reports, for a single molecule through a trained sparse Predictor:
  * device forward latency (compiled executable, chained on-device via
    fori_loop and differenced — the tunnel's ~27ms RTT and dispatch
    overhead cancel out);
  * host packing cost (native C assembly of the 1-graph batch);
  * end-to-end wall time per `Predictor.__call__` (includes one
    host->device transfer + one device->host fetch; on the tunneled
    chip this is transport-dominated — deploy-side numbers exclude the
    tunnel).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from ggnn_tpu.data.synthetic import synthetic_molecules
from ggnn_tpu.serving import Predictor
from ggnn_tpu.training.config import default_params_for
from ggnn_tpu.training.runner import Runner


def main():
    cfg = default_params_for("sparse")
    cfg.update({"num_epochs": 1, "batch_size": 2000})
    runner = Runner("sparse", cfg, log_dir="/tmp/latency_bench", quiet=True,
                    tensorboard=False,
                    train_data=synthetic_molecules(100, seed=0),
                    valid_data=synthetic_molecules(20, seed=1))
    runner.train()
    # Tight envelope: one molecule <= 32 nodes.
    p = Predictor.from_checkpoint(runner.best_model_file, "sparse",
                                  max_nodes=32, max_graphs=8)
    mol = synthetic_molecules(1, seed=5)

    # Warm/compile + correctness.
    out = p(mol)
    assert np.isfinite(out).all()

    # Host packing cost: the general corpus pipeline vs the
    # batch-of-one fast pack __call__ actually uses (bit-identical
    # output, tests/test_serving.py).
    ann = len(mol[0]["node_features"][0])
    t0 = time.time()
    reps = 200
    for _ in range(reps):
        batches = list(p._batches(mol, ann))
    pack_ms = (time.time() - t0) / reps * 1e3
    t0 = time.time()
    for _ in range(reps):
        fast = p._pack_single_sparse(mol[0], ann)
    fast_us = (time.time() - t0) / reps * 1e6
    batch = jax.device_put(batches[0])

    # Device forward latency: chain on device, difference run lengths.
    import dataclasses

    def measure_device(forward):
        def many(params, n):
            def body(i, acc):
                # True data dependence so XLA cannot hoist the forward.
                b2 = dataclasses.replace(
                    batch, node_features=batch.node_features + acc * 1e-20)
                out = forward(params, b2)
                return acc + jnp.sum(out) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.zeros(()))

        g = jax.jit(many, static_argnums=1)
        float(g(p.params, 3))
        # Large iteration counts: the tunnel's ~30ms dispatch noise must
        # be small against the differenced delta for a ~30us forward.
        t0 = time.time(); float(g(p.params, 100)); t1 = time.time()
        t2 = time.time(); float(g(p.params, 4100)); t3 = time.time()
        return ((t3 - t2) - (t1 - t0)) / 4000 * 1e6

    device_us = measure_device(p._forward)

    # End-to-end wall (transport included).
    t0 = time.time()
    for _ in range(10):
        p(mol)
    wall_ms = (time.time() - t0) / 10 * 1e3

    print(f"batch-of-1 sparse inference: device forward {device_us:.0f} us"
          f" | host fast pack {fast_us:.0f} us"
          f" (corpus pipeline {pack_ms*1e3:.0f} us)"
          f" | end-to-end (tunneled transport) {wall_ms:.1f} ms")

    # Deployment-artifact path (ggnn_tpu/export.py): same forward as
    # pinned StableHLO — measures what the exported-call indirection
    # costs on the serving path (expected: nothing).
    from ggnn_tpu.export import export_predictor, load_predictor
    ep = load_predictor(export_predictor(p, "/tmp/latency_bench/m.ggnnx"))
    art_out = ep(mol)
    assert np.allclose(out, art_out, rtol=1e-6, atol=1e-7)
    art_device_us = measure_device(ep._forward)
    t0 = time.time()
    for _ in range(10):
        ep(mol)
    art_wall_ms = (time.time() - t0) / 10 * 1e3
    print(f"  .ggnnx artifact: device forward {art_device_us:.0f} us"
          f" | end-to-end {art_wall_ms:.1f} ms (outputs identical)")

    variant_host_rows()


def variant_host_rows():
    """Batch-of-one HOST packing cost for the remaining serving
    variants (round-4 VERDICT item #5): the dense-family one-graph
    bucket pack (Predictor._pack_single_dense) vs the corpus pipeline,
    and the async topology-cached schedule path vs a cold compile.
    Host-side only — device latency is transport-dominated on the
    tunnel and already characterized by the sparse rows above."""
    from ggnn_tpu.data.loader import DatasetMeta

    mol = synthetic_molecules(1, seed=5)
    ann = len(mol[0]["node_features"][0])
    reps = 200
    for variant, extra in (
            ("blocked", {"batch_size": 4, "dense_bucket_sizes": [32]}),
            ("gcn_blocked", {"batch_size": 4, "dense_bucket_sizes": [32]}),
            ("async", {"num_nodes": 64, "propagation_substeps": 24})):
        cfg = default_params_for(variant)
        cfg.update({"num_epochs": 1, "hidden_size": 16})
        cfg.update(extra)
        runner = Runner(variant, cfg, log_dir="/tmp/latency_bench",
                        quiet=True, tensorboard=False,
                        train_data=synthetic_molecules(40, seed=0),
                        valid_data=synthetic_molecules(10, seed=1))
        runner.train()
        p = Predictor.from_checkpoint(runner.best_model_file, variant,
                                      max_nodes=64, max_graphs=8)
        out = p(mol)
        assert np.isfinite(out).all()
        if variant == "async":
            t0 = time.time()
            for _ in range(reps):
                p._pack_single_async(mol[0], ann)  # batch cache warm
            fast_us = (time.time() - t0) / reps * 1e6
            t0 = time.time()
            for _ in range(reps):
                list(p._batches(mol, ann))  # schedule cache only
            warm_us = (time.time() - t0) / reps * 1e6
            t0 = time.time()
            for _ in range(reps):
                p._async_sched_cache.clear()
                list(p._batches(mol, ann))  # cold: full DAG levelling
            cold_us = (time.time() - t0) / reps * 1e6
            print(f"batch-of-1 {variant} host pack: packed-batch cache "
                  f"{fast_us:.0f} us (schedule-cached pipeline "
                  f"{warm_us:.0f} us, cold compile {cold_us:.0f} us)")
            continue
        t0 = time.time()
        for _ in range(reps):
            p._pack_single_dense(mol[0], ann)
        fast_us = (time.time() - t0) / reps * 1e6

        def corpus_once():
            processed = p.adapter.preprocess(list(mol), False)
            p.adapter.meta = DatasetMeta(
                max_num_vertices=p.meta.max_num_vertices,
                num_edge_types=p.meta.num_edge_types,
                annotation_size=ann)
            return list(p.adapter.batches(processed, False))

        t0 = time.time()
        for _ in range(reps):
            corpus_once()
        slow_us = (time.time() - t0) / reps * 1e6
        print(f"batch-of-1 {variant} host pack: fast {fast_us:.0f} us "
              f"(corpus pipeline {slow_us:.0f} us)")


if __name__ == "__main__":
    main()
