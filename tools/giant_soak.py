"""Giant-graph to-patience soak on the 8-shard virtual mesh (round-5
VERDICT item #9: giant-graph training as a first-class Runner path).

A corpus of large connected graphs — each packed batch ONE deliberately
split giant graph riding the node-sharded boundary exchange — trained
through the production Runner (capacity planning, DFS locality reorder,
rolling best-on-val checkpoints, early stopping) to patience. On this
one-chip environment it runs the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/giant_soak.py [N_TRAIN] [NODES]

The runs/<id>_log.json + best checkpoint are the evidence; on real
hardware the same command (without the CPU forcing) soaks over ICI.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ggnn_tpu.data.synthetic import synthetic_giant_graph
    from ggnn_tpu.parallel import make_mesh
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 300, "patience": 25, "hidden_size": 32,'
        ' "batch_size": %d, "layer_timesteps": [2, 2, 1],'
        ' "residual_connections": {"2": [0]},'
        ' "locality_reorder": true, "use_edge_bias": true}'
        % (nodes + 100))
    train = [synthetic_giant_graph(nodes, seed=s)[0]
             for s in range(n_train)]
    valid = [synthetic_giant_graph(nodes, seed=1000 + s)[0]
             for s in range(max(2, n_train // 4))]
    mesh = make_mesh(n_data=1, n_edge=8)
    runner = Runner("sparse", cfg, log_dir="runs",
                    train_data=train, valid_data=valid,
                    quiet=True, tensorboard=False, mesh=mesh)
    print(f"giant soak: {n_train} train graphs x {nodes} nodes, mesh "
          f"(1,8), boundary cap {runner._nodeshard_caps.boundary_send_total} "
          f"rows; run id {runner.run_id}", flush=True)
    log = runner.train()
    best = min(range(len(log)),
               key=lambda i: sum(log[i]["valid_results"][1]))
    print(f"stopped at epoch {len(log)} (best@{best + 1} + patience "
          f"{cfg['patience']}); valid err_ratio "
          f"{log[0]['valid_results'][2][0]:.3f} -> "
          f"{log[best]['valid_results'][2][0]:.3f}; best ckpt "
          f"{runner.best_model_file}", flush=True)

    # Best checkpoint restores and serves.
    served = Runner("sparse", cfg, log_dir="runs/giant_soak_serve",
                    train_data=train[:1], valid_data=valid[:1],
                    quiet=True, tensorboard=False,
                    restore=runner.best_model_file)
    preds = np.concatenate([np.asarray(o) for o in served.predict(valid)],
                           axis=1)
    assert np.isfinite(preds).all()
    print(f"best checkpoint restored single-chip and served "
          f"{preds.shape[1]} giant-graph predictions", flush=True)


if __name__ == "__main__":
    main()
