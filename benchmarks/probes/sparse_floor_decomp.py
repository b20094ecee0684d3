"""Sparse-step floor decomposition (round 5): is the edge-list train
step still at the row-issue floor under the current toolchain?

The gather probe (gather_floor.py) measures the per-row issue floor at
~12 ns on the current jax/libtpu (down from round-2's 18-21 ns). This
probe times the sparse path's forward / forward+backward / full train
step on the benchmark batch and divides by (combined-lane rows x
propagation steps), reconciling the step against the floor.

Round-5 recorded result (one v5e, 2026-08-20; 20k-node batch, 42,456
lane rows at 95.2% occupancy, 8 prop steps):

    forward only        3.59 ms   10.6 ns/(row*step)  <- AT the floor
    forward + backward  8.75 ms   25.8                (transpose pass)
    full step (+Adam)   9.21 ms   27.1

Conclusion: the forward is speed-of-light for the layout; the whole
step is ~2.5 floor-cost row passes. The 18 ns round-2 number was the
Pallas kernel loop's floor (measured to close the kernel question);
XLA's sorted-scatter path was already at ~11 ns effective.

Usage: python benchmarks/probes/sparse_floor_decomp.py   (on a TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from roofline import _build_runner, _time_chained

    runner = _build_runner("sparse")
    batches = list(runner.adapter.batches(runner.train_processed, True,
                                          runner.np_rng))
    batch = max(batches, key=lambda b: np.asarray(b.node_features).size)
    rows_cap = int(np.asarray(batch.edge_sources_all).shape[0])
    rows_true = float(np.asarray(batch.edge_mask_all).sum())
    prop = sum(runner.config["layer_timesteps"])
    print(f"combined lane: cap {rows_cap} rows, true {rows_true:.0f} "
          f"({rows_true / rows_cap * 100:.1f}% occupancy); "
          f"{prop} prop steps")

    state = jax.device_put(runner.state)
    batch_d = jax.device_put(batch)
    model = runner.model
    inner = runner._make_step(is_training=True)

    def fwd_only(s, b, k):
        out = model.forward(s["params"]["graph"], b, rng=None,
                            is_training=False)
        return s, jnp.sum(out)

    def fwd_bwd(s, b, k):
        def loss_fn(p):
            out = model.forward(p["graph"], b, rng=None,
                                is_training=False)
            return jnp.sum(out * out)
        l, g = jax.value_and_grad(loss_fn)(s["params"])
        # Fold every grad leaf into the scalar so nothing is dead.
        return s, l + sum(jnp.sum(x)
                          for x in jax.tree_util.tree_leaves(g))

    def full_step(s, b, k):
        s, loss, _ = inner(s, b, k)
        return s, loss

    for name, fn in (("forward", fwd_only), ("fwd+bwd", fwd_bwd),
                     ("full step", full_step)):
        t = _time_chained(jax, fn, state, batch_d, jax.random.PRNGKey(0),
                          name)
        print(f"{name:>10}: {t * 1e3:7.3f} ms = "
              f"{t / (rows_cap * prop) * 1e9:5.1f} ns per "
              f"(lane-row x prop-step)")


if __name__ == "__main__":
    main()
