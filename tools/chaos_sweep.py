"""Config / mesh chaos sweeps, checked in (round 5).

Round 4 ran these as one-off harnesses and recorded the conclusions in
PARITY.md; this script makes them reproducible from the repo (the same
standard the round-5 probes meet). Two modes:

  python tools/chaos_sweep.py config [N] [SEED]
      N random configs across variants x cells x attention x dropout x
      native/python packers x lane_pad, each trained 1 epoch on a tiny
      synthetic corpus through the production Runner and then served
      via Runner.predict. PASS = finite predictions, or an invalid
      combo rejected with a CLEAR error (ValueError/KeyError with a
      message — never a bare assert or a crash from deep inside XLA).

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/chaos_sweep.py mesh
      Every (variant, mesh shape, boundary exchange / type-TP) combo on
      the virtual 8-device mesh, 1 epoch each, all losses finite.

Exit code 0 = every case passed or was cleanly rejected; 1 otherwise.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _finite_predict(runner, mols):
    out = np.concatenate([np.asarray(o) for o in runner.predict(mols)],
                         axis=1)
    return bool(np.isfinite(out).all())


def config_chaos(n_cases: int, seed: int) -> int:
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.runner import Runner

    rng = np.random.RandomState(seed)
    variants = ["sparse", "dense", "blocked", "gcn", "gcn_blocked",
                "rgcn", "async"]
    cells = ["GRU", "CudnnCompatibleGRUCell", "RNN"]
    acts = ["tanh", "ReLU"]
    failures = []
    for case in range(n_cases):
        variant = variants[rng.randint(len(variants))]
        cfg = default_params_for(variant)
        cfg.update({
            "num_epochs": 1,
            "hidden_size": int(rng.choice([8, 16, 100])),
            "random_seed": int(rng.randint(10_000)),
            "out_layer_dropout_keep_prob": float(rng.choice([1.0, 0.8])),
            "native_pack": bool(rng.randint(2)),
            "lane_pad": [True, False, "auto"][rng.randint(3)],
        })
        if variant in ("sparse", "rgcn"):
            cfg.update({
                "batch_size": int(rng.choice([300, 700])),
                "graph_rnn_cell": cells[rng.randint(len(cells))],
                "graph_rnn_activation": acts[rng.randint(2)],
                "use_propagation_attention": bool(rng.randint(2)),
                "use_edge_bias": bool(rng.randint(2)),
                "edge_weight_dropout_keep_prob":
                    float(rng.choice([1.0, 0.8])),
                "graph_state_dropout_keep_prob":
                    float(rng.choice([1.0, 0.9])),
                "combined_edge_lanes": bool(rng.randint(2)),
                "aggregate_first": bool(rng.randint(2)),
            })
            # Occasionally emit a deliberately invalid residual map.
            if rng.rand() < 0.2:
                cfg["residual_connections"] = {"1": [0, 5]}  # bad layer
        elif variant == "async":
            cfg.update({
                "num_nodes": 400,
                "propagation_substeps": 25,
                "graph_rnn_cell": ["GRU", "RNN"][rng.randint(2)],
                "graph_rnn_activation": acts[rng.randint(2)],
                # rounds must be even; make ~20% of cases odd (must be
                # REJECTED with ValueError, the round-4 fix).
                "propagation_rounds": int(rng.choice([2, 4, 3])),
            })
        elif variant in ("dense", "blocked", "gcn_blocked"):
            cfg.update({
                "batch_size": int(rng.choice([32, 64])),
                "graph_state_dropout_keep_prob":
                    float(rng.choice([1.0, 0.9])),
            })
        else:  # gcn
            cfg.update({"batch_size": int(rng.choice([300, 700]))})

        label = f"[{case}] {variant} " + str({
            k: cfg[k] for k in ("hidden_size", "native_pack", "lane_pad")})
        try:
            runner = Runner(variant, cfg, log_dir="/tmp/chaos_runs",
                            quiet=True, tensorboard=False,
                            train_data=synthetic_molecules(40, seed=case),
                            valid_data=synthetic_molecules(10,
                                                           seed=case + 1))
            log = runner.train()
            ok = np.isfinite(log[-1]["train_results"][0]) and \
                _finite_predict(runner, synthetic_molecules(3,
                                                            seed=case + 2))
            print(f"PASS  {label}" if ok else f"NONFINITE  {label}",
                  flush=True)
            if not ok:
                failures.append(label)
        except (ValueError, KeyError, RuntimeError) as exc:
            # RuntimeError included: e.g. dense remainder-dropping with
            # a corpus smaller than batch_size raises a guidance message
            # ("set drop_remainder: false ...") — a clean rejection.
            if not str(exc):
                print(f"UNEXPECTED (empty message)  {label}: "
                      f"{type(exc).__name__}", flush=True)
                failures.append(label)
            else:
                print(f"REJECTED (clear error)  {label}: "
                      f"{type(exc).__name__}: {str(exc)[:120]}",
                      flush=True)
        except Exception as exc:
            print(f"UNEXPECTED  {label}: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
            traceback.print_exc()
            failures.append(label)
    print(f"\nconfig chaos: {n_cases} cases, {len(failures)} failures")
    return 1 if failures else 0


def mesh_chaos() -> int:
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.parallel import make_mesh
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.runner import Runner

    cases = []
    for variant, extra in [
            ("sparse", {}), ("gcn", {}), ("blocked", {}), ("async", {}),
            ("gcn_blocked", {})]:
        for (nd, ne) in [(8, 1), (2, 2), (1, 8), (2, 4)]:
            if ne > 1 and variant not in ("sparse", "gcn"):
                continue  # edge axis is sparse/gcn only
            exchanges = ([None] if ne == 1 else
                         ["alltoall", "shift", "ragged_emulated"])
            for ex in exchanges:
                cases.append((variant, nd, ne, ex, extra))
    # Type-TP rows (sparse only, num_edge_types divisible by ne).
    cases.append(("sparse", 2, 2, "type_tp", {}))
    cases.append(("sparse", 1, 4, "type_tp", {}))

    failures = []
    for variant, nd, ne, ex, extra in cases:
        cfg = default_params_for(variant)
        cfg.update({"num_epochs": 1, "hidden_size": 8})
        cfg.update(extra)
        if variant in ("sparse", "gcn", "rgcn"):
            cfg["batch_size"] = 300
        elif variant == "async":
            cfg.update({"num_nodes": 300, "propagation_substeps": 25})
        else:
            # Mesh dense stacking requires ONE compiled bucket shape
            # (documented; the error message says exactly this).
            cfg.update({"batch_size": 16, "dense_bucket_sizes": [32]})
        if ex == "type_tp":
            cfg["edge_parallelism"] = "type_tp"
        elif ex is not None:
            cfg["boundary_exchange"] = ex
        label = f"{variant} mesh=({nd},{ne}) exchange={ex}"
        try:
            runner = Runner(variant, cfg, log_dir="/tmp/chaos_runs",
                            quiet=True, tensorboard=False,
                            train_data=synthetic_molecules(48, seed=7),
                            valid_data=synthetic_molecules(12, seed=8),
                            mesh=make_mesh(n_data=nd, n_edge=ne))
            log = runner.train()
            ok = np.isfinite(log[-1]["train_results"][0])
            print(("PASS  " if ok else "NONFINITE  ") + label, flush=True)
            if not ok:
                failures.append(label)
        except Exception as exc:
            print(f"UNEXPECTED  {label}: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
            failures.append(label)
    print(f"\nmesh chaos: {len(cases)} cases, {len(failures)} failures")
    return 1 if failures else 0


def serving_fuzz(n_cases: int, seed: int) -> int:
    """Random valid AND malformed requests against a Predictor per
    variant: valid requests must return finite [K, n]; malformed ones
    must raise ValueError (a clean rejection) — never any other
    exception, never silent wrong shapes (round-5 addition; the
    serving entry validates features and vertex ids for every
    variant)."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.serving import Predictor
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.variants import make_adapter

    rng = np.random.RandomState(seed)
    pool = synthetic_molecules(32, seed=seed)
    failures = []
    for variant in ("sparse", "blocked", "gcn", "gcn_blocked", "async"):
        cfg = default_params_for(variant)
        cfg["hidden_size"] = 16
        if variant == "async":
            cfg["propagation_substeps"] = 25
        meta = infer_metadata([pool], cfg["tie_fwd_bkwd"])
        adapter = make_adapter(variant, cfg, meta)
        model = adapter.build_model()
        key = jax.random.PRNGKey(seed)
        state = {"params": {
            "graph": model.init_params(key),
            "heads": init_output_heads(key, cfg["hidden_size"],
                                       cfg["task_ids"])}}
        p = Predictor(variant, cfg, meta, state, max_nodes=256,
                      max_graphs=16)
        for case in range(n_cases):
            kind = rng.randint(6)
            label = f"{variant}[{case}] kind={kind}"
            g = dict(pool[rng.randint(len(pool))])
            expect_error = False
            if kind == 1:   # out-of-range vertex id
                g["graph"] = list(g["graph"]) + [[0, 1, 999]]
                expect_error = True
            elif kind == 2:  # negative vertex id
                g["graph"] = list(g["graph"]) + [[-3, 1, 0]]
                expect_error = True
            elif kind == 3:  # empty node features
                g = dict(g, node_features=[])
                expect_error = True
            elif kind == 4:  # bad edge type
                g["graph"] = list(g["graph"]) + [[0, 99, 1]]
                # GCN-family DISCARDS edge types (reference parity:
                # chem_tensorflow_gcn.py:116-142 symmetrizes ignoring
                # the type column), so any type value is valid input
                # there; the typed variants must reject it.
                expect_error = variant not in ("gcn", "gcn_blocked")
            elif kind == 5:  # multi-graph request, one malformed
                good = dict(pool[rng.randint(len(pool))])
                g = [good, dict(g, graph=list(g["graph"]) + [[0, 1, 999]])]
                expect_error = True
            req = g if isinstance(g, list) else [g]
            try:
                out = np.asarray(p(req))
                if expect_error:
                    print(f"ACCEPTED MALFORMED  {label}", flush=True)
                    failures.append(label)
                elif out.shape != (len(cfg["task_ids"]), len(req)) \
                        or not np.isfinite(out).all():
                    print(f"BAD OUTPUT  {label}: {out.shape}", flush=True)
                    failures.append(label)
            except ValueError as exc:
                if not expect_error:
                    print(f"REJECTED VALID  {label}: {str(exc)[:120]}",
                          flush=True)
                    failures.append(label)
            except Exception as exc:
                print(f"UNEXPECTED  {label}: {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)
                traceback.print_exc()
                failures.append(label)
        print(f"{variant}: {n_cases} fuzz cases done", flush=True)
    print(f"\nserving fuzz: {5 * n_cases} cases, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "config"
    if mode == "config":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
        seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        sys.exit(config_chaos(n, seed))
    elif mode == "mesh":
        sys.exit(mesh_chaos())
    elif mode == "serving":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        sys.exit(serving_fuzz(n, seed))
    else:
        print(f"unknown mode {mode}; use config|mesh|serving")
        sys.exit(2)
