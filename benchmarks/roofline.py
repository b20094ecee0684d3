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

Padded programs (round 5, VERDICT item #5): the 128-lane compute
layout (`lane_pad`, ops/lanes.py) adds zero-lane FLOPs that XLA's cost
analysis counts as real work — the padded blocked program reports 111%
of the f32 rate, i.e. the padding itself. The honest utilisation
denominator is therefore the UNPADDED program's FLOP count over the
PADDED program's measured time; this script now computes both itself
(it compiles a `lane_pad: false` twin of every step for cost analysis
only, and times the shipped default), so the MFU table regenerates
from one command with no hand-derivation.

Also emitted per variant: an `<variant>_eval` row (forward + masked
loss, no backward/optimizer — the validation-epoch step), and for
sparse a `sparse_serving` row (the Predictor's batch-forward on the
2048-node serving envelope — the deployed inference path).

Peaks default to one TPU v5e chip: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Usage:
  python benchmarks/roofline.py [dense sparse gcn blocked ...]
         [--peak-tflops 197] [--peak-gbs 819] [--no-eval] [--no-serving]

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


def _emit(name, n_graphs, step_s, flops, bytes_accessed, peak_tflops,
          peak_gbs, extra=None):
    tflops = flops / step_s / 1e12
    apparent_gbs = bytes_accessed / step_s / 1e9
    # f32 matmuls decompose into 3 bf16 MXU passes.
    f32_peak_tflops = peak_tflops / 3.0
    result = {
        "variant": name,
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
    result.update(extra or {})
    print(json.dumps(result), flush=True)
    return result


def _time_chained(jax, step, state, batch, key, warm_label):
    """Differenced chained-step timing (utils/timing.py methodology).

    An eval step passes its state through unchanged and ignores the rng
    key, so a naive loop is loop-invariant and XLA hoists the entire
    forward out (accumulating the loss alone is NOT enough — the first
    attempts here measured 0.001 then 0.025 ms/step for dense_eval,
    i.e. the cost of one add). The accumulated loss is therefore fed
    BACK into the batch features (x + acc*1e-30 — adds nothing at f32,
    but XLA cannot prove that), making every iteration's forward depend
    on the previous one. Same trap family as eval_throughput.py."""
    import dataclasses

    def run(s, n):
        import jax.numpy as jnp

        def body(i, carry):
            s, acc = carry
            b = dataclasses.replace(
                batch, node_features=batch.node_features + acc * 1e-30)
            s, loss = step(s, b, jax.random.fold_in(key, i))
            return s, acc + loss
        return jax.lax.fori_loop(0, n, body, (s, jnp.zeros(())))

    g = jax.jit(run)
    t0 = time.time()
    _, l = g(state, 1)
    float(l)
    log(f"{warm_label}: compile {time.time() - t0:.0f}s")
    # Three runs of increasing length; consecutive differences cancel
    # the fixed ~30ms round-trip. The probe run is sized off the naive
    # pilot, the final run off the RTT-FREE probe estimate — a fixed
    # step count under-measures fast steps badly (gcn_blocked at
    # ~50us/step over 64 steps = 3ms of device work differenced
    # against multi-ms RTT jitter measured 0.045-0.156 ms/step across
    # runs; with work sized to ~3s it is stable).
    t0 = time.time(); _, l = g(state, 4); float(l); t1 = time.time()
    n_p = int(np.clip(2.0 / max((t1 - t0) / 4, 1e-6), 16, 400))
    _, l = g(state, n_p); float(l); t2 = time.time()
    step_est = max(((t2 - t1) - (t1 - t0)) / (n_p - 4), 1e-7)
    n2 = int(np.clip(3.0 / step_est, 4 * n_p, 100000))
    _, l = g(state, n2); float(l); t3 = time.time()
    return ((t3 - t2) - (t2 - t1)) / (n2 - n_p)


def _build_runner(variant, config_extra=None):
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    cfg = resolve_config(variant, None, VARIANT_OVERRIDES[variant])
    cfg.update(config_extra or {})
    return Runner(variant, cfg, log_dir="/tmp/roofline_runs",
                  train_data=synthetic_molecules(6400, seed=0),
                  valid_data=synthetic_molecules(64, seed=1),
                  quiet=True, tensorboard=False)


def analyze(variant: str, peak_tflops: float, peak_gbs: float,
            with_eval: bool = True):
    import jax

    runner = _build_runner(variant)
    # The largest training batch is the steady-state shape (dense
    # bucketing emits a few small-bucket stragglers).
    batches = list(runner.adapter.batches(runner.train_processed, True,
                                          runner.np_rng))
    batch = max(batches, key=lambda b: np.asarray(b.node_features).size)
    n_graphs = int(batch.num_graphs)
    batch = jax.device_put(batch)
    state = jax.device_put(runner.state)
    key = jax.random.PRNGKey(7)

    # Unpadded-FLOP twin: the same step with the 128-lane compute
    # padding disabled. Costs come from THIS program; time from the
    # shipped default — the zero-lane FLOPs the padded program adds are
    # layout overhead, not work, and counting them overstates MFU
    # (111% of the f32 rate for blocked). Only built for the variants
    # whose models resolve `lane_pad` (the dense/blocked/gcn_blocked
    # family); edge-list variants compile to identical counts, so the
    # twin would just burn a duplicate corpus build + remote compile.
    from ggnn_tpu.ops.lanes import resolve_lane_pad
    lane_padded = (variant in ("dense", "blocked", "gcn_blocked")
                   and resolve_lane_pad(runner.config,
                                        runner.config["hidden_size"]))
    unpadded = (_build_runner(variant, {"lane_pad": False})
                if lane_padded else runner)

    results = []
    for is_training, name in [(True, variant)] + (
            [(False, f"{variant}_eval")] if with_eval else []):
        inner = runner._make_step(is_training=is_training)
        inner_u = unpadded._make_step(is_training=is_training)

        def step(s, b, k, _inner=inner):
            s, loss, _ = _inner(s, b, k)
            return s, loss

        def step_u(s, b, k, _inner=inner_u):
            s, loss, _ = _inner(s, b, k)
            return s, loss

        # Cost analysis of ONE optimized step (what the scan body runs)
        # on the UNPADDED twin; padded counts kept for the delta.
        flops_u, bytes_u = cost_of(
            jax.jit(step_u).lower(state, batch, key).compile())
        flops_p, _ = cost_of(
            jax.jit(step).lower(state, batch, key).compile())
        step_s = _time_chained(jax, step, state, batch, key, name)
        results.append(_emit(
            name, n_graphs, step_s, flops_u, bytes_u, peak_tflops,
            peak_gbs,
            extra={"padded_gflops_per_step": round(flops_p / 1e9, 2),
                   "pad_flop_overhead_pct": round(
                       100 * (flops_p - flops_u) / max(flops_u, 1), 1)}))
    return results


def analyze_serving(peak_tflops: float, peak_gbs: float):
    """sparse_serving row: the Predictor's envelope batch-forward (the
    deployed inference path — forward only, no loss)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.serving import Predictor
    from ggnn_tpu.training.config import resolve_config

    cfg = resolve_config("sparse", None, VARIANT_OVERRIDES["sparse"])
    pool = synthetic_molecules(256, seed=0)
    meta = infer_metadata([pool], cfg["tie_fwd_bkwd"])
    model_probe = __import__(
        "ggnn_tpu.models.sparse_ggnn", fromlist=["SparseGGNN"]
    ).SparseGGNN(cfg, meta.num_edge_types)
    k = jax.random.PRNGKey(0)
    state = {"params": {
        "graph": model_probe.init_params(k),
        "heads": init_output_heads(k, cfg["hidden_size"],
                                   cfg["task_ids"])}}
    predictor = Predictor("sparse", cfg, meta, state)
    annotation = meta.annotation_size
    batch = next(iter(predictor._batches(pool, annotation)))
    n_graphs = int(batch.num_graphs)
    batch = jax.device_put(batch)
    params = jax.device_put(predictor.params)

    forward = predictor._forward
    compiled = jax.jit(lambda p, b: forward(p, b)).lower(
        params, batch).compile()
    flops, bytes_accessed = cost_of(compiled)

    def step(p, b, _k):
        # acc-perturbed features defeat cross-iteration CSE; the
        # perturbation is 1e-30-scaled (adds nothing at f32).
        out = forward(p, b)
        return p, jnp.sum(out)

    def run(p, n):
        def body(i, carry):
            p, acc = carry
            b = dataclasses.replace(
                batch,
                node_features=batch.node_features + acc * 1e-30)
            return step(p, b, None)
        return jax.lax.fori_loop(0, n, body, (p, jnp.zeros(())))

    g = jax.jit(run)
    t0 = time.time(); _, l = g(params, 1); float(l)
    log(f"sparse_serving: compile {time.time() - t0:.0f}s")
    t0 = time.time(); _, l = g(params, 4); float(l); t1 = time.time()
    _, l = g(params, 68); float(l); t2 = time.time()
    step_s = ((t2 - t1) - (t1 - t0)) / 64
    return _emit("sparse_serving", n_graphs, step_s, flops,
                 bytes_accessed, peak_tflops, peak_gbs,
                 extra={"envelope_nodes": predictor.max_nodes,
                        "envelope_graphs": predictor.max_graphs})


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
    with_eval = "--no-eval" not in sys.argv
    for v in variants:
        analyze(v, peak_tflops, peak_gbs, with_eval=with_eval)
    if "sparse" in variants and "--no-serving" not in sys.argv:
        analyze_serving(peak_tflops, peak_gbs)


if __name__ == "__main__":
    main()
