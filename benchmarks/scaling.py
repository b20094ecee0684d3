"""Multi-chip scaling-efficiency harness (SURVEY north star: >=80%
edges/s efficiency 1 -> N chips).

Usage: python benchmarks/scaling.py [N_DATA] [N_EDGE] [VARIANT] [EXCHANGE]

VARIANT is "sparse" (default), "gcn", or "giant" — all ride the
node-sharded boundary-exchange layout when N_EDGE > 1. "giant" is
sparse over ONE 8,000-node connected graph (SURVEY §5.7's stress case:
a deliberately split giant packed graph, where the cut — and the
boundary exchange — is substantial instead of near-zero). Runs the shard_map training
step over an (N_DATA, N_EDGE) mesh and over a (1, 1) mesh on the same
global batch stack, reports edges/s/chip and the scaling efficiency. On
a single-chip environment run it on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py 4 2

(CPU numbers validate the harness and the collectives, not ICI.)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # The axon sitecustomize forces the tunneled TPU platform at
    # interpreter start; honor an explicit JAX_PLATFORMS=cpu request
    # (required for the virtual-device mesh runs documented above).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from ggnn_tpu.data import native_pack
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.parallel import make_mesh, make_parallel_steps, stack_batches
    from ggnn_tpu.training.config import default_params_for
    from ggnn_tpu.training.optimizer import make_optimizer

    n_data = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_edge = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    variant = sys.argv[3] if len(sys.argv) > 3 else "sparse"
    exchange = sys.argv[4] if len(sys.argv) > 4 else "alltoall"
    n_chips = n_data * n_edge

    if variant == "gcn":
        from ggnn_tpu.data import packing
        from ggnn_tpu.models.gcn import GCN
        cfg = default_params_for("gcn")
        cfg.update({"batch_size": 2000,
                    "graph_state_dropout_keep_prob": 1.0})
        data = synthetic_molecules(64 * n_chips, seed=0)
        meta = infer_metadata([data], True)
        proc = packing.preprocess_gcn(data, [0], {}, False)
        caps = packing.plan_gcn_capacities(proc, cfg["batch_size"])
        batches = list(packing.pack_gcn_batches(
            proc, cfg["batch_size"], caps, cfg["hidden_size"],
            meta.annotation_size, False, None))
        total_edges = sum(float((np.asarray(b.edge_weights) != 0).sum())
                          for b in batches)
        prop_steps = cfg["num_timesteps"]
    else:
        cfg = default_params_for("sparse")
        cfg.update({"batch_size": 2000,
                    "edge_weight_dropout_keep_prob": 1.0,
                    "use_propagation_attention": True,
                    "use_edge_bias": True, "native_pack": True})
        if variant == "giant":
            from ggnn_tpu.data.reorder import dfs_reorder
            from ggnn_tpu.data.synthetic import synthetic_giant_graph
            cfg["batch_size"] = 10000
            data = synthetic_giant_graph(8000, seed=0)
            raw_edges = data[0]["graph"]
            data = [dfs_reorder(data[0])]
            nl8 = -(-8000 // max(n_edge, 1))
            def _cut(edges):
                return sum((a // nl8) != (b // nl8) for a, _, b in edges)
            print(f"giant graph: DFS locality reorder cut "
                  f"{_cut(raw_edges)} -> {_cut(data[0]['graph'])} edges "
                  f"({n_edge} contiguous ranges)")
        else:
            data = synthetic_molecules(64 * n_chips, seed=0)
        meta = infer_metadata([data], True)
        proc = native_pack.preprocess_sparse_native(
            data, meta.num_edge_types, True, [0], {}, False)
        caps = native_pack.plan_capacities_native(proc, cfg["batch_size"])
        batches = list(native_pack.pack_sparse_batches_native(
            proc, meta.num_edge_types, True, cfg["batch_size"], caps,
            cfg["hidden_size"], meta.annotation_size, False, None))
        total_edges = sum(float(np.asarray(b.edge_mask).sum())
                          for b in batches)
        prop_steps = sum(cfg["layer_timesteps"])
    steps_per_call = 8

    def measure(nd, ne):
        from ggnn_tpu.parallel import node_shard as ns
        mesh = make_mesh(n_data=nd, n_edge=ne)
        edge_axis = "edge" if ne > 1 else None
        if variant == "gcn":
            from ggnn_tpu.models.gcn import GCN
            model = GCN(cfg, edge_axis=edge_axis)
        else:
            model = SparseGGNN(cfg, meta.num_edge_types,
                               edge_axis=edge_axis)
        key = jax.random.PRNGKey(0)
        params = {"graph": model.init_params(key),
                  "heads": init_output_heads(key, cfg["hidden_size"], [0])}
        opt = make_optimizer(cfg["learning_rate"], cfg["clamp_gradient_norm"])
        state = {"params": params, "opt_state": opt.init(params)}
        if ne > 1:
            kind = "gcn" if variant == "gcn" else "sparse"
            train, _ = make_parallel_steps(model, opt, cfg, [0], mesh,
                                           batch_kind=kind)
            # margin 1.0: the stack is static here (no epoch reshuffle),
            # so exact capacities are safe and lane occupancy is maximal.
            if variant == "gcn":
                ns_caps = ns.plan_gcn_shard_caps(batches, ne, margin=1.0)
                stack = jax.device_put(ns.gcn_shard_and_stack(
                    batches, ns_caps, n_data=nd, exchange=exchange))
            else:
                ns_caps = ns.plan_node_shard_caps(batches, ne, margin=1.0)
                stack = jax.device_put(ns.shard_and_stack(
                    batches, ns_caps, n_data=nd, exchange=exchange))
            # Per-step cross-chip ICI traffic of the node-sharded
            # boundary exchange vs round 1's replicate+psum design. A
            # shard's all_to_all chunk to itself stays local, so only
            # (ne-1) of the ne chunks cross the interconnect.
            h = cfg["hidden_size"]
            new_vol = (ne - 1) * ns_caps.boundary * h * 4
            shift_vol = sum(ns_caps.boundary_shifts) * h * 4
            old_vol = batches[0].node_capacity * h * 4
            print(f"  shift-bucketed exchange (boundary_exchange="
                  f"'shift'): {shift_vol/1024:.1f} KiB/step "
                  f"({new_vol/max(shift_vol,1):.1f}x under the dense "
                  f"all_to_all's padded {new_vol/1024:.1f} KiB)")
            # Ragged transport: TRUE per-pair sizes, zero wire padding
            # (worst shard's total cross-chip send rows — self pairs
            # are never materialized, so every row crosses ICI).
            rag = (ns.shard_gcn_batch(batches[0], ns_caps,
                                      exchange="ragged")
                   if variant == "gcn" else
                   ns.shard_batch(batches[0], ns_caps,
                                  exchange="ragged"))
            rag_vol = int(np.asarray(rag.send_idx.send_sizes)
                          .sum(axis=1).max()) * h * 4
            print(f"  ragged all-to-all exchange (boundary_exchange="
                  f"'ragged'): {rag_vol/1024:.1f} KiB/step — the true "
                  f"cut, zero padding")
            # Lane occupancy straight off the stack just built (axis 0
            # is the step axis: real batches first, then any all-padding
            # fillers — slice those off so they don't dilute it).
            lane = (stack.loc_w if variant == "gcn" else stack.loc_mask)
            occ_l = float(
                (np.asarray(jax.device_get(lane))[:len(batches)]
                 != 0).mean())
            print(f"  per-shard per-prop-step comm: boundary all_to_all "
                  f"{new_vol/1024:.1f} KiB vs full-[N,H] psum "
                  f"{old_vol/1024:.1f} KiB "
                  f"({old_vol/max(new_vol,1):.1f}x less traffic); "
                  f"local-lane occupancy {occ_l*100:.1f}%")
        elif variant == "gcn":
            from ggnn_tpu.parallel.stacking import (empty_masked_batch_like,
                                                    stack_any_batches)
            train, _ = make_parallel_steps(model, opt, cfg, [0], mesh,
                                           batch_kind="data_only",
                                           batch_template=batches[0])
            stack = jax.device_put(stack_any_batches(
                batches, nd, empty_masked_batch_like))
        else:
            train, _ = make_parallel_steps(model, opt, cfg, [0], mesh)
            stack = jax.device_put(stack_batches(batches, n_data=nd,
                                                 n_edge=ne))

        def run(state, n):
            m = None
            for i in range(n):
                state, m = train(state, stack,
                                 jax.random.fold_in(jax.random.PRNGKey(1), i))
            return state, m

        s, m = run(state, 1)
        float(m["loss"])  # compile + warm
        t0 = time.time()
        s, m = run(s, 2)
        loss = float(m["loss"])
        t1 = time.time()
        # Size the long run from the pilot so the measured work dwarfs
        # timing jitter (a fixed short run goes negative for fast
        # models under the CPU collectives' busy-wait variance).
        extra = max(steps_per_call,
                    int(np.ceil(3.0 / max((t1 - t0) / 2, 1e-5))))
        s, m = run(s, 2 + extra)
        loss = float(m["loss"])
        t2 = time.time()
        if jax.default_backend() == "cpu":
            # CPU fetches are cheap — plain division is the lower-noise
            # estimator on the virtual mesh.
            per_step = (t2 - t1) / (2 + extra)
        else:
            # The tunneled TPU's ~30ms per-fetch cost dominates short
            # runs; differenced run lengths cancel it.
            per_step = ((t2 - t1) - (t1 - t0)) / extra
        return total_edges * prop_steps / per_step, loss

    base_eps, _ = measure(1, 1)
    mesh_eps, loss = measure(n_data, n_edge)
    eff = mesh_eps / (base_eps * n_chips)
    print(f"(1,1): {base_eps/1e6:.1f}M edge-msg/s | "
          f"({n_data},{n_edge}): {mesh_eps/1e6:.1f}M edge-msg/s "
          f"({mesh_eps/n_chips/1e6:.1f}M/chip) | "
          f"scaling efficiency {eff*100:.1f}% | loss {loss:.5f}")


if __name__ == "__main__":
    main()
