"""Dense-propagation contraction A/B probes (round-5 VERDICT item #3:
the round-3 measurement harness, previously /tmp-only).

Round 3 took the dense GGNN train step 523.9k -> 632.1k graphs/s
through three measured re-formulations of the SAME algebra
(benchmarks/README.md "Round-3: dense reassociation"). This probe
regenerates the decisive comparisons in a self-contained harness at the
bench shapes (B=256, V=32, T=4, H=100; 4 propagation timesteps with the
REAL concat-free TF1 GRU cell from ops/cells.py closing each step —
the cell must be present because the round-3 effects are layout
interactions between the aggregation's output and the cell's GEMMs —
forward+backward over all parameters via value_and_grad; only the
optimizer is absent):

  A. einsum-pair (round-2 layout): acts = einsum over (adjacency,
     states, per-type weights) as two chained einsums per step.
  B. reassociated (round 3, step 1): sum_t A_t (h W_t) ->
     sum_t (A_t h) W_t, the W-side contraction as ONE
     [B*V, T*H] @ [T*H, H] GEMM. Identical FLOPs.
  C. reassociated + pre-transposed adjacency (round 3, step 2): the
     forward-constant adjacency stored as [B, V*T, V] so the gathered
     states reshape straight to [B, V, T*H] with no per-step transpose.
  D. variant C with the [T,H,H] -> [T*H,H] weight reshape INSIDE the
     timestep loop — the round-3 layout trap: the backward then
     accumulates the weight cotangent per step in [T,H,H], flipping
     XLA:TPU's layout assignment and inserting bf16 copies (recorded:
     571.9k vs 632.4k graphs/s on the full bench, a 10.6% regression
     from ONE hoisted reshape).

Recorded full-bench equivalents (one v5e, round 3): A 523.9k ->
B 583.8k (+11.4%) -> C 611.9k (+4.8%); D regresses C by ~10%.

Round-5 rerun from this checked-in harness (2026-08-20, one v5e,
current jax/libtpu): A 0.464 / B 0.469 / C 0.351 / D 0.475 ms per
fwd+bwd step. The load-bearing conclusions reproduce with margin:
C (the shipped layout) beats every alternative by 1.32-1.35x, and the
in-loop weight reshape trap costs 1.35x (recorded 10.6% on the full
bench — the isolated step exaggerates it because the GRU/Adam dilution
is absent). One delta vs round 3: A and B are within noise of each
other HERE (current XLA contracts the einsum-pair spelling into a
near-identical program once the cell anchors the layouts), so the
probe's pass criterion is C < min(A, B) and D > C — the decisive
levers — not the historical A/B gap.

Usage: python benchmarks/probes/dense_reassoc.py   (on a TPU chip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

B, V, T, H = 256, 32, 4, 100
STEPS = 4


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/ggnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"# platform: {jax.default_backend()}; B={B} V={V} T={T} H={H}, "
          f"{STEPS} timesteps, fwd+bwd", file=sys.stderr)

    from ggnn_tpu.ops import cells

    rng = np.random.RandomState(0)
    adj = (rng.rand(B, T, V, V) < 0.04).astype(np.float32)   # [B,T,V,V]
    # Forward-constant pre-transposed layout: row index v*T + t.
    adj_pre = np.ascontiguousarray(
        adj.transpose(0, 2, 1, 3).reshape(B, V * T, V))      # [B,V*T,V]
    h0 = rng.randn(B, V, H).astype(np.float32)
    w0 = (rng.randn(T, H, H) / np.sqrt(H)).astype(np.float32)
    cell0 = cells.gru_init(jax.random.PRNGKey(3), H, H)

    def _cell(cp, acts, h):
        flat = cells.gru_apply(cp, acts.reshape(B * V, H),
                               h.reshape(B * V, H))
        return flat.reshape(B, V, H)

    def prop_einsum_pair(p, h, _adj_pre, a):
        """A: the round-2 spelling — einsum contractions per step."""
        w = p["w"]
        for _ in range(STEPS):
            msgs = jnp.einsum("bvh,thk->btvk", h, w)
            acts = jnp.einsum("btuv,btvk->buk", a, msgs)
            h = _cell(p["cell"], acts, h)
        return h

    def prop_reassoc(p, h, _adj_pre, a):
        """B: (A_t h) first, then one [B*V, T*H] @ [T*H, H] GEMM; the
        per-step transpose to (v, t) row order still happens in-loop."""
        w_flat = p["w"].reshape(T * H, H)            # hoisted (round 3)
        for _ in range(STEPS):
            g = jnp.einsum("btuv,bvh->btuh", a, h)   # [B,T,V,H]
            g = g.transpose(0, 2, 1, 3).reshape(B * V, T * H)
            acts = (g @ w_flat).reshape(B, V, H)
            h = _cell(p["cell"], acts, h)
        return h

    def prop_reassoc_pre(p, h, adj_pre, _a):
        """C: the shipped layout — pre-transposed [B, V*T, V] adjacency,
        gathered states reshape straight to [B*V, T*H], no in-loop
        transpose (models/dense_ggnn.py)."""
        w_flat = p["w"].reshape(T * H, H)
        for _ in range(STEPS):
            g = jnp.matmul(adj_pre, h)               # [B, V*T, H]
            acts = (g.reshape(B * V, T * H) @ w_flat).reshape(B, V, H)
            h = _cell(p["cell"], acts, h)
        return h

    def prop_reshape_trap(p, h, adj_pre, _a):
        """D: variant C with the weight reshape INSIDE the loop — the
        backward accumulates dW per step in [T,H,H] and XLA:TPU's layout
        assignment degrades (the round-3 trap)."""
        for _ in range(STEPS):
            g = jnp.matmul(adj_pre, h)
            acts = (g.reshape(B * V, T * H)
                    @ p["w"].reshape(T * H, H)).reshape(B, V, H)
            h = _cell(p["cell"], acts, h)
        return h

    variants = [("A einsum-pair", prop_einsum_pair),
                ("B reassociated", prop_reassoc),
                ("C reassoc+pre-transposed", prop_reassoc_pre),
                ("D in-loop W reshape (trap)", prop_reshape_trap)]

    adj_d = jax.device_put(adj)
    adj_pre_d = jax.device_put(adj_pre)
    h_d = jax.device_put(h0)
    p_d = jax.device_put({"w": w0, "cell": cell0})
    results = {}
    for name, prop in variants:
        def step(p, h):
            loss, dp = jax.value_and_grad(
                lambda p_: jnp.sum(prop(p_, h, adj_pre_d, adj_d)))(p)
            # Dependency-chaining update keeps shapes and defeats CSE.
            return jax.tree_util.tree_map(
                lambda x, g: x - 1e-12 * g, p, dp), loss

        @jax.jit
        def chained(p, h, n):
            def body(i, carry):
                p, _ = carry
                return step(p, h)
            return jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))

        _, l = chained(p_d, h_d, 1)
        float(l)  # compile + warm
        t0 = time.time(); _, l = chained(p_d, h_d, 2); float(l)
        t1 = time.time()
        n2 = max(8, int(np.ceil(3.0 / max((t1 - t0) / 2, 1e-5))))
        _, l = chained(p_d, h_d, 2 + n2); float(l)
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / n2
        results[name] = per
        print(f"{name:<30} {per * 1e3:.3f} ms/step (fwd+bwd)")

    a, b, c, d = (results[k] for k in
                  ("A einsum-pair", "B reassociated",
                   "C reassoc+pre-transposed", "D in-loop W reshape (trap)"))
    print(f"\nB vs A: {a / b:.2f}x | C vs B: {b / c:.2f}x | "
          f"D vs C (trap cost): {d / c:.2f}x")
    ok = c < min(a, b) and c < d
    print("C fastest and D > C (the load-bearing round-3 conclusions): "
          + ("REPRODUCED" if ok else "NOT reproduced"))


if __name__ == "__main__":
    main()
