"""Multi-chip scaling-efficiency harness (SURVEY north star: >=80%
edges/s efficiency 1 -> N chips).

Usage:
    python benchmarks/scaling.py [N_DATA] [N_EDGE] [VARIANT] [EXCHANGE]
    python benchmarks/scaling.py --project [--out SCALING.json]

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

--project (round 5, VERDICT item #2): the quantified 1 -> N projection
for the >=80% BASELINE.md north star. Real ICI is hardware-blocked in
this environment, so the projection is a MODEL, not a measurement —
but every input except the link bandwidth is measured here and now:
single-chip step times are timed live on the attached chip (the honest
chained-epoch methodology), per-step wire volumes come from the actual
shard planner over the actual batches, and cut fractions from the
packed lanes. Emits a table + SCALING.json; the hardware-day runbook
for validating it on a real slice is in benchmarks/README.md.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

# --- v5e interconnect model constants (public figures; see the
# "How to Scale Your Model" book's TPU chapter). Per-link one-way ICI
# bandwidth, 2D torus => a 1D mesh axis owns 2 directed links per chip.
ICI_LINK_BW = 4.5e10       # bytes/s, one-way, per link
ICI_LINKS_PER_AXIS = 2     # bidirectional ring on one torus axis
ICI_HOP_LATENCY = 1e-6     # s, per collective hop (small-message floor)
DCN_HOST_BW = 2.5e10       # bytes/s per host (inter-slice DP only)


def build_setup(variant, n_chips, exchange="alltoall"):
    """Corpus + packed batches + model config for one harness variant.

    Returns (cfg, meta, batches, total_edges, prop_steps). Shared by the
    measure and --project modes so both operate on identical inputs.
    """
    import jax
    from ggnn_tpu.data import native_pack
    from ggnn_tpu.data.loader import infer_metadata
    from ggnn_tpu.data.synthetic import synthetic_molecules
    from ggnn_tpu.training.config import default_params_for

    if variant == "gcn":
        from ggnn_tpu.data import packing
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
        return cfg, meta, batches, total_edges, prop_steps

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
        data = [dfs_reorder(data[0])]
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
    return cfg, meta, batches, total_edges, prop_steps


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # The axon sitecustomize forces the tunneled TPU platform at
    # interpreter start; honor an explicit JAX_PLATFORMS=cpu request
    # (required for the virtual-device mesh runs documented above).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if "--project" in sys.argv:
        return project_main()

    import jax.numpy as jnp
    from ggnn_tpu.models.base import init_output_heads
    from ggnn_tpu.models.sparse_ggnn import SparseGGNN
    from ggnn_tpu.parallel import make_mesh, make_parallel_steps, stack_batches
    from ggnn_tpu.training.optimizer import make_optimizer

    n_data = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_edge = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    variant = sys.argv[3] if len(sys.argv) > 3 else "sparse"
    exchange = sys.argv[4] if len(sys.argv) > 4 else "alltoall"
    n_chips = n_data * n_edge

    if variant == "giant":
        # Report the DFS locality-reorder cut improvement up front (the
        # reorder itself happens inside build_setup).
        from ggnn_tpu.data.synthetic import synthetic_giant_graph
        from ggnn_tpu.data.reorder import dfs_reorder
        g0 = synthetic_giant_graph(8000, seed=0)[0]
        nl8 = -(-8000 // max(n_edge, 1))
        def _cut(edges):
            return sum((a // nl8) != (b // nl8) for a, _, b in edges)
        print(f"giant graph: DFS locality reorder cut "
              f"{_cut(g0['graph'])} -> {_cut(dfs_reorder(g0)['graph'])} "
              f"edges ({n_edge} contiguous ranges)")

    cfg, meta, batches, total_edges, prop_steps = build_setup(
        variant, n_chips, exchange)
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


# ---------------------------------------------------------------------------
# --project: the quantified 1 -> N model (round-5 VERDICT item #2)
# ---------------------------------------------------------------------------

def _wire_bytes_per_step(ns, batches, ns_caps, n_edge, hidden, variant,
                         exchange):
    """Per-shard cross-chip send volume of ONE propagation step's
    boundary exchange, in bytes — the quantity the measure() mode prints
    and benchmarks/README.md tabulates. Computed from the real shard
    planner over the real packed batches (zero hand-entry)."""
    h4 = hidden * 4  # f32 rows
    if exchange == "alltoall":
        return (n_edge - 1) * ns_caps.boundary * h4
    if exchange == "shift":
        return sum(ns_caps.boundary_shifts) * h4
    if exchange == "ragged":
        shard = (ns.shard_gcn_batch(batches[0], ns_caps, exchange="ragged")
                 if variant == "gcn" else
                 ns.shard_batch(batches[0], ns_caps, exchange="ragged"))
        return int(np.asarray(shard.send_idx.send_sizes)
                   .sum(axis=1).max()) * h4
    raise ValueError(exchange)


def _cut_fraction(ns, batches, ns_caps, variant):
    """True boundary-lane edge rows / all true edge rows, batch 0."""
    shard = (ns.shard_gcn_batch(batches[0], ns_caps, exchange="alltoall")
             if variant == "gcn" else
             ns.shard_batch(batches[0], ns_caps, exchange="alltoall"))
    if variant == "gcn":
        loc = float((np.asarray(shard.loc_w) != 0).sum())
        bnd = float((np.asarray(shard.bnd_w) != 0).sum())
    else:
        loc = float(np.asarray(shard.loc_mask).sum())
        bnd = float(np.asarray(shard.bnd_mask).sum())
    return bnd / max(loc + bnd, 1.0)


def _ring_alltoall_time(v_bytes, n):
    """Time for each chip to exchange its per-step boundary volume over
    one bidirectional ring axis of size n. `v_bytes` is the per-chip
    egress; chunks travel an average of ~n/4 hops on a bidirectional
    ring, and transit traffic shares the same 2 directed links, so the
    effective serialization is v * (n/4) / (2 * link_bw), plus a per-hop
    latency floor for the n/2-deep pipeline."""
    hops = max(n / 4.0, 1.0)
    return (v_bytes * hops / (ICI_LINKS_PER_AXIS * ICI_LINK_BW)
            + (n / 2.0) * ICI_HOP_LATENCY)


def _shift_time(shift_volumes_bytes, n):
    """Time for the shift-bucketed transport: one ppermute per ring
    shift k, whose B_k rows travel EXACTLY min(k, n-k) hops (the
    per-pair distance is fixed by the shift — unlike the all_to_all
    model above, no average-hop factor applies on top, they would
    double-charge distance). Transit traffic shares the axis's 2
    directed links; the shifts are independent, so the latency floor is
    one pipeline depth, not one per shift."""
    link_s = sum(v * min(k + 1, n - (k + 1))
                 for k, v in enumerate(shift_volumes_bytes))
    return (link_s / (ICI_LINKS_PER_AXIS * ICI_LINK_BW)
            + (n / 2.0) * ICI_HOP_LATENCY)


def project_main():
    import jax
    backend = jax.default_backend()
    out_path = "SCALING.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from ggnn_tpu.parallel import node_shard as ns

    on_tpu = backend not in ("cpu",)
    print(f"# 1->N scaling projection (MODEL, not measurement — real ICI "
          f"is not attached).")
    print(f"# Inputs measured live: single-chip step time "
          f"(backend={backend}), per-step wire volumes and cut fractions "
          f"from the shard planner over the packed batches.")
    print(f"# Link model: v5e 1D torus axis, {ICI_LINK_BW/1e9:.0f} GB/s "
          f"per directed link x {ICI_LINKS_PER_AXIS}, "
          f"{ICI_HOP_LATENCY*1e6:.0f} us/hop.")

    results = {"model": {
        "ici_link_bw_bytes_per_s": ICI_LINK_BW,
        "ici_links_per_axis": ICI_LINKS_PER_AXIS,
        "ici_hop_latency_s": ICI_HOP_LATENCY,
        "notes": (
            "Projection, not a measurement: real multi-chip ICI is not "
            "available in the build environment. t1 (single-chip step "
            "time) is measured live on the attached chip; wire volumes "
            "and cut fractions are computed by the real shard planner "
            "over the real packed batches. eff_overlap assumes the "
            "boundary exchange fully overlaps the local-lane compute "
            "(the async start/done schedule that "
            "tests/test_tpu_aot.py::test_boundary_exchange_overlaps_"
            "local_compute pins); eff_serial assumes zero overlap. The "
            "truth on hardware lies in [eff_serial, eff_overlap]. "
            "Validation runbook: benchmarks/README.md 'Hardware-day "
            "runbook'."),
        "t1_backend": backend,
    }, "rows": []}

    for variant in ("sparse", "giant"):
        cfg, meta, batches, total_edges, prop_steps = build_setup(
            variant, 8)
        hidden = cfg["hidden_size"]
        n_batches = len(batches)

        # --- measure the single-chip step time, live, with the honest
        # chained-epoch methodology (utils/timing.py — a python dispatch
        # loop under the tunneled TPU measures round-trips, not device
        # work; the first projection attempt went NEGATIVE that way) ---
        from ggnn_tpu.models.base import (init_output_heads,
                                          masked_regression_loss)
        from ggnn_tpu.models.sparse_ggnn import SparseGGNN
        from ggnn_tpu.training.optimizer import make_optimizer
        from ggnn_tpu.utils.timing import make_epochs_fn, time_epochs
        model = SparseGGNN(cfg, meta.num_edge_types, edge_axis=None)
        key = jax.random.PRNGKey(0)
        params = {"graph": model.init_params(key),
                  "heads": init_output_heads(key, hidden, [0])}
        opt = make_optimizer(cfg["learning_rate"],
                             cfg["clamp_gradient_norm"])
        state = {"params": params, "opt_state": opt.init(params)}
        param_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree_util.tree_leaves(params))

        def loss_fn(p, batch, rng_key):
            final = model.forward(p["graph"], batch, rng=rng_key,
                                  is_training=True)
            computed = model.readout(p["heads"], [0], final, batch)
            loss, _ = masked_regression_loss(
                computed, batch.targets, batch.target_mask, [0], {})
            return loss

        def train_step(state, batch, rng_key):
            loss, grads = jax.value_and_grad(loss_fn)(
                state["params"], batch, rng_key)
            updates, opt_state = opt.update(grads, state["opt_state"],
                                            state["params"])
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state["params"], updates)
            return ({"params": new_params, "opt_state": opt_state}, loss)

        stacked = jax.device_put(jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches))
        keys = jax.device_put(jax.random.split(key, n_batches))
        state = jax.device_put(state)
        epochs_fn = make_epochs_fn(train_step)
        t_stack, _ = time_epochs(epochs_fn, state, [stacked], [keys],
                                 1, 26)
        if t_stack <= 0:  # jitter ate the pilot; take a longer run
            t_stack, _ = time_epochs(epochs_fn, state, [stacked], [keys],
                                     1, 201)
        n2 = int(np.clip(5.0 / max(t_stack, 1e-5), 26, 20000))
        t_stack, _ = time_epochs(epochs_fn, state, [stacked], [keys],
                                 1, n2)
        # Per-batch train-step time; the projection works per batch.
        t1_batch = t_stack / n_batches
        print(f"\n{variant}: single-chip {t_stack*1e3:.2f} ms/stack over "
              f"{n_batches} batch(es) -> t1 {t1_batch*1e3:.3f} ms/step; "
              f"{total_edges:.0f} edges, {prop_steps} prop steps, "
              f"params {param_bytes/1e6:.2f} MB")
        print(f"{'mesh':>10} {'transport':>10} {'wire/step':>10} "
              f"{'cut%':>6} {'t_comm':>8} {'eff_serial':>10} "
              f"{'eff_overlap':>11}")

        edges_per_batch = total_edges / n_batches

        for n_edge in (2, 4, 8):
            ns_caps = ns.plan_node_shard_caps(batches, n_edge, margin=1.0)
            c = _cut_fraction(ns, batches, ns_caps, variant)
            for exchange in ("alltoall", "shift", "ragged"):
                v = _wire_bytes_per_step(ns, batches, ns_caps, n_edge,
                                         hidden, variant, exchange)
                # Forward exchange + its transposed reverse in the
                # backward pass move the same volume: 2 exchanges per
                # propagation step. Shift gets its own hop accounting
                # (per-shift distances are exact, not averaged).
                if exchange == "shift":
                    t_one = _shift_time(
                        [b * hidden * 4
                         for b in ns_caps.boundary_shifts], n_edge)
                else:
                    t_one = _ring_alltoall_time(v, n_edge)
                t_comm = 2 * prop_steps * t_one
                t_compute = t1_batch / n_edge
                # Serial bracket: every byte waits.
                t_serial = t_compute + t_comm
                # Overlap bracket: comm hides under the local-lane
                # compute (fraction 1-c of the edge work); only the
                # boundary lane (c) serializes after the exchange.
                t_overlap = max(t_compute * (1 - c), t_comm) \
                    + t_compute * c
                eff_s = t_compute / t_serial
                eff_o = t_compute / t_overlap
                print(f"{'(1,%d)' % n_edge:>10} {exchange:>10} "
                      f"{v/1024:>8.1f}Ki {c*100:>5.1f}% "
                      f"{t_comm*1e6:>6.0f}us {eff_s*100:>9.1f}% "
                      f"{eff_o*100:>10.1f}%")
                results["rows"].append({
                    "variant": variant, "mesh": [1, n_edge],
                    "axis": "edge", "transport": exchange,
                    "t1_ms": t1_batch * 1e3,
                    "wire_bytes_per_step": v,
                    "cut_fraction": c,
                    "t_comm_ms": t_comm * 1e3,
                    "eff_serial": eff_s, "eff_overlap": eff_o,
                    # total edge-messages per train step / (chips * t_N)
                    "edge_msgs_per_s_per_chip_projected": (
                        edges_per_batch * prop_steps
                        / (n_edge * t_overlap)),
                    "meets_80pct_north_star": bool(eff_o >= 0.80),
                })

        # Data-parallel axis: gradient psum of the full param set once
        # per step over one ring axis (ICI within a slice). Volume is
        # 2(N-1)/N * bytes for a bidirectional-ring all-reduce.
        for n_data in (2, 4, 8):
            v = 2 * (n_data - 1) / n_data * param_bytes
            t_comm = (v / (ICI_LINKS_PER_AXIS * ICI_LINK_BW)
                      + (n_data / 2.0) * ICI_HOP_LATENCY)
            t_compute = t1_batch  # DP replicates the step on more data
            eff_s = t_compute / (t_compute + t_comm)
            eff_o = t_compute / max(t_compute, t_comm)
            print(f"{'(%d,1)' % n_data:>10} {'psum(DP)':>10} "
                  f"{v/1024:>8.1f}Ki {'-':>6} {t_comm*1e6:>6.0f}us "
                  f"{eff_s*100:>9.1f}% {eff_o*100:>10.1f}%")
            results["rows"].append({
                "variant": variant, "mesh": [n_data, 1], "axis": "data",
                "transport": "psum", "t1_ms": t1_batch * 1e3,
                "wire_bytes_per_step": v, "cut_fraction": None,
                "t_comm_ms": t_comm * 1e3,
                "eff_serial": eff_s, "eff_overlap": eff_o,
                "meets_80pct_north_star": bool(eff_o >= 0.80),
            })

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    n_ok = sum(r["meets_80pct_north_star"] for r in results["rows"])
    print(f"\nwrote {out_path}: {n_ok}/{len(results['rows'])} rows "
          f"project >=80% efficiency (eff_overlap)")


if __name__ == "__main__":
    main()
