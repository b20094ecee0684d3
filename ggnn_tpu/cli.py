"""Command-line entry points.

Parity surface with the reference CLIs (chem_tensorflow_*.py usage
strings): one subcommand per variant plus `rgcn` (the README.md:48-52
recipe as a first-class name), with the same flags:

    python -m ggnn_tpu.cli sparse [--config-file FILE] [--config JSON]
        [--log_dir DIR] [--data_dir DIR] [--restore FILE]
        [--freeze-graph-model] [--evaluate]

Extras over the reference: `--synthetic N` trains on the built-in
QM9-shaped generator (no rdkit/network needed), `--restrict_data N`
(documented but dead upstream — chem_tensorflow.py:111-113 reads a flag
no usage string defines; here it works), and `--quiet`.
"""

import argparse
import os
import sys
import traceback


def _honor_jax_platforms_env():
    """Some environments install a sitecustomize that force-selects a
    platform plugin at interpreter start, overriding JAX_PLATFORMS. Make
    the user's env var authoritative again before any backend
    initializes."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)


def _enable_compile_cache():
    """Persistent compilation cache (set GGNN_TPU_COMPILE_CACHE="" to
    disable): remote/TPU compiles cost minutes; repeat invocations of
    the same configuration reuse the serialized executables."""
    default_cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "ggnn_tpu", "jax_cache")
    # User-scoped, not a world-shared /tmp path: on multi-user hosts a
    # fixed /tmp dir breaks for the second user (permissions) and lets
    # any local user pre-create it and control the serialized XLA
    # executables other users deserialize (round-5 review).
    cache_dir = os.environ.get("GGNN_TPU_COMPILE_CACHE", default_cache)
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without these options


_honor_jax_platforms_env()
_enable_compile_cache()

from ggnn_tpu.training.config import resolve_config
from ggnn_tpu.training.runner import Runner


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ggnn_tpu",
                                description="TPU-native GGNN framework")
    p.add_argument("variant",
                   choices=["sparse", "dense", "blocked", "gcn",
                            "gcn_blocked", "rgcn", "async"])
    p.add_argument("--config-file", dest="config_file", default=None,
                   help="Hyperparameter configuration file path (JSON).")
    p.add_argument("--config", default=None,
                   help="Hyperparameter configuration dictionary (JSON).")
    p.add_argument("--log_dir", default=".", help="Log dir name.")
    p.add_argument("--data_dir", default="", help="Data dir name.")
    p.add_argument("--restore", default=None,
                   help="File to restore weights from.")
    p.add_argument("--freeze-graph-model", action="store_true",
                   help="Freeze weights of graph model components.")
    p.add_argument("--evaluate", action="store_true",
                   help="Example evaluation using a restored model.")
    p.add_argument("--restrict_data", type=int, default=None,
                   help="Use only the first N graphs of each file.")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="Train on N synthetic QM9-shaped molecules instead "
                        "of JSON files.")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="Write a jax.profiler trace of the first training "
                        "epoch to DIR.")
    p.add_argument("--save-every-epoch", action="store_true",
                   help="Also write a rolling <run_id>_model_last.pickle "
                        "after every epoch (preemption recovery).")
    p.add_argument("--checkpoint-every-steps", type=int, default=0,
                   metavar="K",
                   help="Mid-epoch preemption recovery: every K training "
                        "steps, write the rolling checkpoint WITH the "
                        "data-iterator state (epoch, stream position, "
                        "RNG), so --restore resumes the same epoch at "
                        "the same batch.")
    p.add_argument("--pdb", action="store_true",
                   help="Drop into pdb.post_mortem on any exception (the "
                        "reference CLIs' behavior, e.g. "
                        "chem_tensorflow_sparse.py:386-389).")
    p.add_argument("--export-artifact", default=None, metavar="PATH",
                   help="With --restore: write a .ggnnx deployment "
                        "artifact (pinned StableHLO + weights; see "
                        "ggnn_tpu/export.py) instead of training. Serve "
                        "it with `python -m ggnn_tpu.server --checkpoint "
                        "PATH` or ggnn_tpu.export.load_predictor.")
    p.add_argument("--export-max-nodes", type=int, default=2048,
                   help="Serving envelope for --export-artifact "
                        "(edge-list/async variants).")
    p.add_argument("--export-max-graphs", type=int, default=256,
                   help="Serving envelope for --export-artifact.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.export_artifact is not None:
        if args.restore is None:
            print("--export-artifact requires --restore CHECKPOINT",
                  file=sys.stderr)
            return 2
        try:
            from ggnn_tpu.export import export_predictor
            from ggnn_tpu.serving import Predictor
            # --config/--config-file apply as OVERRIDES on the
            # checkpoint's embedded config (host-side keys: bucket
            # tables, native_pack, compute_dtype ...) — silently
            # dropping them made the documented "re-export with a
            # bucket table covering this request" remedy impossible
            # from the CLI (round-5 review).
            overrides = {}
            if args.config_file is not None:
                import json as _json
                with open(args.config_file) as f:
                    overrides.update(_json.load(f))
            if args.config is not None:
                import json as _json
                overrides.update(_json.loads(args.config))
            predictor = Predictor.from_checkpoint(
                args.restore, args.variant,
                max_nodes=args.export_max_nodes,
                max_graphs=args.export_max_graphs,
                config_overrides=overrides or None)
            out = export_predictor(predictor, args.export_artifact)
            if not args.quiet:
                print(f"wrote {out} ({os.path.getsize(out)} bytes, "
                      f"platforms cpu+tpu)")
            return 0
        except Exception:
            traceback.print_exc()
            if args.pdb:
                import pdb
                pdb.post_mortem()
            return 1

    # Everything from config parsing onward sits inside the try:
    # --pdb promises post-mortem on ANY exception, reference behavior
    # (chem_tensorflow_sparse.py:380-389 wraps the whole main body) —
    # bad --config JSON or an empty task_ids must not bypass it.
    try:
        config = resolve_config(args.variant, args.config_file,
                                args.config)

        train_data = valid_data = None
        if args.synthetic is not None:
            from ggnn_tpu.data.synthetic import synthetic_molecules
            n = args.synthetic
            # Emit as many target columns as the configured task ids
            # need (reference _extract_labels indexes targets BY task
            # id), so multi-task configs train on --synthetic out of
            # the box.
            if not config["task_ids"]:
                raise ValueError("config task_ids must be non-empty")
            n_targets = max(config["task_ids"]) + 1
            train_data = synthetic_molecules(
                n, seed=config["random_seed"], num_targets=n_targets)
            valid_data = synthetic_molecules(
                max(1, n // 10), seed=config["random_seed"] + 1,
                num_targets=n_targets)

        runner = Runner(
            args.variant, config,
            data_dir=args.data_dir, log_dir=args.log_dir,
            restore=args.restore,
            freeze_graph_model=args.freeze_graph_model,
            train_data=train_data, valid_data=valid_data,
            restrict_data=args.restrict_data, quiet=args.quiet,
            profile_dir=args.profile,
            save_every_epoch=args.save_every_epoch,
            checkpoint_every_steps=args.checkpoint_every_steps)
        if args.evaluate:
            if valid_data is not None:
                runner.example_evaluation(example_molecules=valid_data[:10])
            else:
                runner.example_evaluation(
                    valid_file=os.path.join(args.data_dir,
                                            config["valid_file"]))
        else:
            runner.train()
        return 0
    except Exception:
        traceback.print_exc()
        if args.pdb:
            import pdb
            pdb.post_mortem()
        return 1


if __name__ == "__main__":
    sys.exit(main())
