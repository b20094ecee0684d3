"""Roofline / speed-of-light analysis for each compute path.

For every requested variant this script builds the Runner's real jitted
train step on one representative batch, asks XLA's compiled cost
analysis (post-fusion optimized HLO) for the step's FLOPs and bytes
accessed, measures the step time with the chained-scan methodology
(utils/timing.py), and reports the distance to the compute roof:

  * achieved TFLOP/s, as a fraction of the bf16 MXU peak and of the
    effective f32 MXU rate (f32 matmuls run through the bf16 systolic
    array as a 3-pass decomposition, so f32 peak ~ bf16 peak / 3);
  * "apparent" GB/s = HLO bytes accessed / time. HLO byte counts are
    an UPPER BOUND on physical HBM traffic — post-fusion they still
    count every consumer's re-read and whole operands of gathers — so
    apparent GB/s above the physical HBM rate (observed on the dense
    paths) proves a large fraction of that counted traffic is served
    from VMEM, not that the chip beat its memory. No t_SoL is derived
    from bytes for exactly that reason; the FLOP floor is the only
    defensible speed-of-light denominator this method yields.

Peaks default to one TPU v5e chip: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Usage:
  python benchmarks/roofline.py [dense sparse gcn blocked ...]
         [--peak-tflops 197] [--peak-gbs 819]

Reference context: the reference has no per-kernel perf accounting at
all (SURVEY §6 — one instances/sec line, chem_tensorflow.py:252); this
is the "every hot kernel at speed-of-light" audit BASELINE.md asks for.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = 197.0   # v5e bf16 MXU peak
PEAK_GBS = 819.0      # v5e HBM bandwidth

VARIANT_OVERRIDES = {
    # Reference defaults; batch sizes chosen to match the published
    # benchmark workloads (benchmarks/README.md).
    # dense_bucket_sizes [16,32]: the coarse buckets bench.py's headline
    # workload uses (numerically identical; fewer compiled shapes).
    "dense": '{"num_epochs": 1, "dense_bucket_sizes": [16, 32]}',
    "blocked": '{"num_epochs": 1}',
    "sparse": '{"num_epochs": 1, "batch_size": 20000}',
    "gcn": '{"num_epochs": 1, "batch_size": 20000}',
    "gcn_blocked": '{"num_epochs": 1, "dense_bucket_sizes": [16, 32]}',
    # propagation_substeps 40: the synthetic corpus contains graphs whose
    # BFS schedule is deeper than the reference's 15-substep cap (the
    # reference would assert too, chem_tensorflow_async.py:315).
    "async": '{"num_epochs": 1, "num_nodes": 20000, "propagation_substeps": 40}',
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def analyze(variant: str, peak_tflops: float, peak_gbs: float):
    import jax
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(variant, None, VARIANT_OVERRIDES[variant])
    runner = Runner(variant, cfg, log_dir="/tmp/roofline_runs",
                    train_data=synthetic_molecules(6400, seed=0),
                    valid_data=synthetic_molecules(64, seed=1),
                    quiet=True, tensorboard=False)
    # The largest training batch is the steady-state shape (dense
    # bucketing emits a few small-bucket stragglers).
    batches = list(runner.adapter.batches(runner.train_processed, True,
                                          runner.np_rng))
    batch = max(batches, key=lambda b: np.asarray(b.node_features).size)
    n_graphs = int(batch.num_graphs)
    batch = jax.device_put(batch)
    state = jax.device_put(runner.state)
    key = jax.random.PRNGKey(7)

    inner = runner._make_step(is_training=True)

    def step(s, b, k):
        s, loss, _ = inner(s, b, k)
        return s, loss

    # Cost analysis of ONE optimized step (what the scan body runs).
    compiled = jax.jit(step).lower(state, batch, key).compile()
    flops, bytes_accessed = cost_of(compiled)

    # Timing: chain steps on device, difference two run lengths.
    def run(s, n):
        def body(i, carry):
            s, _ = carry
            return step(s, batch, jax.random.fold_in(key, i))
        import jax.numpy as jnp
        return jax.lax.fori_loop(0, n, body, (s, jnp.zeros(())))

    g = jax.jit(run, static_argnums=())
    t0 = time.time()
    _, l = g(state, 1)
    float(l)
    log(f"{variant}: compile {time.time() - t0:.0f}s")
    t0 = time.time(); _, l = g(state, 4); float(l); t1 = time.time()
    _, l = g(state, 68); float(l); t2 = time.time()
    step_s = ((t2 - t1) - (t1 - t0)) / 64

    tflops = flops / step_s / 1e12
    apparent_gbs = bytes_accessed / step_s / 1e9
    # f32 matmuls decompose into 3 bf16 MXU passes.
    f32_peak_tflops = peak_tflops / 3.0
    result = {
        "variant": variant,
        "graphs_per_batch": n_graphs,
        "step_ms": round(step_s * 1e3, 3),
        "graphs_per_s": round(n_graphs / step_s),
        "gflops_per_step": round(flops / 1e9, 2),
        "hlo_mbytes_per_step_upper_bound": round(bytes_accessed / 1e6, 2),
        "achieved_tflops": round(tflops, 2),
        "pct_of_bf16_peak": round(100 * tflops / peak_tflops, 1),
        "pct_of_f32_mxu_rate": round(100 * tflops / f32_peak_tflops, 1),
        "apparent_gbs": round(apparent_gbs, 1),
        "apparent_gbs_exceeds_hbm": apparent_gbs > peak_gbs,
        "flop_floor_ms": round(flops / (peak_tflops * 1e12) * 1e3, 3),
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    peak_tflops, peak_gbs = PEAK_TFLOPS, PEAK_GBS
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--peak-tflops":
            peak_tflops = float(argv[i + 1])
        if a == "--peak-gbs":
            peak_gbs = float(argv[i + 1])
    variants = [a for a in args
                if a in VARIANT_OVERRIDES] or ["dense"]
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/ggnn_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"platform: {jax.default_backend()}; roofs: "
        f"{peak_tflops} TFLOP/s, {peak_gbs} GB/s")
    for v in variants:
        analyze(v, peak_tflops, peak_gbs)


if __name__ == "__main__":
    main()
