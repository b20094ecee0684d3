"""shard_map training/eval steps over the (data, edge) mesh.

One parallel step consumes a *stacked* GraphBatch (leading step axis,
see parallel/stacking.py) and treats the whole stack as a single global
batch with the reference's loss semantics (chem_tensorflow.py:158-170):
per-task sums of |diff| and 0.5*diff^2 are computed per shard, combined
with `psum` over the "data" axis, and normalised by the *global* masked
target count — exactly what the reference would compute had it seen the
union of the shards' graphs as one batch.

Gradient synchronisation: NONE is written out explicitly, and that is
deliberate. JAX's autodiff transposes `psum` to `psum` (the pmap-era
rule, still the shard_map semantics in jax 0.9): differentiating a loss
that was psummed over "data" — and whose forward pass psummed message
aggregates over "edge" — yields parameter gradients that arrive on every
shard already summed over both mesh axes. Adding manual psums here would
double-count (verified against a single-device global-batch oracle in
tests/test_parallel.py, which checks every gradient leaf across mesh
shapes; that test is the guard if a future JAX changes the transpose
semantics).
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ggnn_tpu.parallel.mesh import (DATA_AXIS, EDGE_AXIS,
                                    overlap_compiler_options)
from ggnn_tpu.parallel.stacking import stacked_batch_specs
from ggnn_tpu.utils.constants import SMALL_NUMBER


def make_parallel_steps(model, optimizer, config: Dict,
                        task_ids: Sequence[int], mesh: Mesh,
                        return_grads: bool = False,
                        batch_kind: str = "sparse",
                        batch_template=None,
                        state_template=None,
                        combined_lanes: bool = False) -> Tuple:
    """Build (train_step, eval_step), each jitted over `mesh`.

    `batch_kind="sparse"` targets `GraphBatch`es (edge axis allowed;
    when the mesh's edge axis is >1 the model must have been built with
    `edge_axis="edge"` so its aggregation psums over the mesh).
    `batch_kind="dense"` targets same-shape `DenseGraphBatch`es and
    `batch_kind="data_only"` any fixed-shape batch pytree (pass an
    unstacked `batch_template` for spec derivation) — both are data
    parallelism only. Steps take (state, stacked_batch, key) and
    return (state, metrics) with metrics = {loss, accuracies[K],
    num_graphs} — global, replicated.
    """
    n_edge = mesh.shape[EDGE_AXIS]
    if batch_kind in ("dense", "data_only") and n_edge > 1:
        raise ValueError(f"{batch_kind} mesh training is data-parallel "
                         "only (use n_edge=1)")
    if n_edge > 1 and getattr(model, "edge_axis", None) != EDGE_AXIS:
        raise ValueError(
            "mesh has edge-parallelism but the model was not built with "
            "edge_axis='edge'")
    if batch_kind == "sparse_tp" and state_template is None:
        raise ValueError("batch_kind='sparse_tp' needs state_template "
                         "(param/opt-state sharding is path-derived)")

    use_graph = config["use_graph"]
    keep_prob = config["out_layer_dropout_keep_prob"]
    rescale = jnp.array(
        [1.0 / (config["task_sample_ratios"].get(task_id) or 1.0)
         for task_id in task_ids], dtype=jnp.float32)

    def batch_sums(params, batch, rng, is_training):
        """Per-task (abs, sq, mask) sums for ONE local batch."""
        if hasattr(batch, "local_view"):
            batch = batch.local_view()
        rng_fwd, rng_head = ((None, None) if rng is None
                             else tuple(jax.random.split(rng)))
        if use_graph:
            final = model.forward(params["graph"], batch, rng=rng_fwd,
                                  is_training=is_training)
        else:
            final = jnp.zeros_like(batch.node_features)
        kp = keep_prob if is_training else 1.0
        computed = model.readout(
            params["heads"], list(task_ids), final, batch,
            keep_prob=kp, rng=rng_head if kp < 1.0 else None)
        diff = (computed - batch.targets) * batch.target_mask
        return (jnp.sum(jnp.abs(diff), axis=1),
                jnp.sum(0.5 * jnp.square(diff), axis=1),
                jnp.sum(batch.target_mask, axis=1))

    # Node-sharded edge partitioning (batch_kind "sparse"/"gcn",
    # n_edge>1) owns DISJOINT node rows per edge shard, so dropout masks
    # must be drawn independently per shard — folding only the data axis
    # would give node rows at equal local offsets identical masks.
    # Type-TP ("sparse_tp") replicates the node arrays across the edge
    # axis and REQUIRES the shared key (all replicas must apply one
    # mask).
    shard_rng_over_edge = batch_kind in ("sparse", "gcn") and n_edge > 1

    def global_loss(params, batch_stack, key, is_training):
        b_local = batch_stack.num_graphs.shape[0]
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            if shard_rng_over_edge:
                key = jax.random.fold_in(key, jax.lax.axis_index(EDGE_AXIS))
            keys = jax.random.split(key, b_local)
            sums = jax.vmap(
                lambda b, k: batch_sums(params, b, k, is_training)
            )(batch_stack, keys)
        else:
            sums = jax.vmap(
                lambda b: batch_sums(params, b, None, is_training)
            )(batch_stack)
        abs_s, sq_s, mask_s = (jnp.sum(s, axis=0) for s in sums)  # [K]
        abs_s = jax.lax.psum(abs_s, DATA_AXIS)
        sq_s = jax.lax.psum(sq_s, DATA_AXIS)
        mask_s = jax.lax.psum(mask_s, DATA_AXIS)
        target_num = mask_s + SMALL_NUMBER
        accuracies = abs_s / target_num
        loss = jnp.sum(sq_s / target_num * rescale)
        return loss, accuracies

    def train_step(state, batch_stack, key):
        (loss, accs), grads = jax.value_and_grad(
            global_loss, has_aux=True)(
                state["params"], batch_stack, key, True)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state["params"], updates)
        num_graphs = jax.lax.psum(
            jnp.sum(batch_stack.num_graphs), DATA_AXIS)
        metrics = {"loss": loss, "accuracies": accs,
                   "num_graphs": num_graphs}
        if return_grads:  # test/debug hook: the synced global gradient
            metrics["grads"] = grads
        return {"params": params, "opt_state": opt_state}, metrics

    def eval_step(state, batch_stack, key):
        loss, accs = global_loss(state["params"], batch_stack, None, False)
        num_graphs = jax.lax.psum(
            jnp.sum(batch_stack.num_graphs), DATA_AXIS)
        return state, {"loss": loss, "accuracies": accs,
                       "num_graphs": num_graphs}

    state_specs = P()  # params/opt state replicated on every chip
    metric_extra_specs = {}
    if batch_kind == "sparse_tp":
        from ggnn_tpu.parallel.tp import tp_batch_specs, tp_state_specs
        state_specs = tp_state_specs(state_template)
        batch_specs = tp_batch_specs()
        if return_grads:
            # Sharded weight leaves' gradients stay sharded.
            metric_extra_specs["grads"] = tp_state_specs(
                state_template["params"])
    elif batch_kind == "dense":
        from ggnn_tpu.parallel.stacking import stacked_dense_batch_specs
        batch_specs = stacked_dense_batch_specs()
    elif batch_kind == "data_only":
        from ggnn_tpu.parallel.stacking import data_parallel_specs
        if batch_template is None:
            raise ValueError("batch_kind='data_only' needs batch_template")
        batch_specs = data_parallel_specs(batch_template)
    elif batch_kind == "gcn":
        # Node-sharded GCN (parallel/node_shard.py GCN section): the
        # step consumes stacked GCNNodeShardedBatch pytrees.
        from ggnn_tpu.parallel.node_shard import gcn_sharded_batch_specs
        batch_specs = gcn_sharded_batch_specs()
    elif n_edge > 1:
        # Node-sharded edge partitioning (parallel/node_shard.py): the
        # step consumes stacked NodeShardedGraphBatch pytrees.
        from ggnn_tpu.parallel.node_shard import sharded_batch_specs
        batch_specs = sharded_batch_specs()
    else:
        # Data-parallel sparse: `combined_lanes=True` when the stacks
        # keep the type-combined aggregation lane
        # (stack_batches(keep_combined=True) — the DP mesh path should
        # run the same ~3x single-chip layout per shard).
        batch_specs = stacked_batch_specs(n_edge, combined=combined_lanes)
    train_metric_specs = P()
    if metric_extra_specs:  # train metrics carry sharded grad leaves
        train_metric_specs = {"loss": P(), "accuracies": P(),
                              "num_graphs": P(), **metric_extra_specs}

    # On TPU meshes, compile with async collectives + the latency-hiding
    # scheduler so the boundary exchange overlaps the local-lane compute
    # (see overlap_compiler_options; XLA:TPU's default all-to-all
    # lowering is synchronous and would serialize the exchange).
    compiler_options = overlap_compiler_options(mesh) or None
    train = jax.jit(
        jax.shard_map(
            train_step, mesh=mesh,
            in_specs=(state_specs, batch_specs, P()),
            out_specs=(state_specs, train_metric_specs),
            check_vma=True,
        ),
        donate_argnums=(0,),
        compiler_options=compiler_options,
    )
    evaluate = jax.jit(
        jax.shard_map(
            eval_step, mesh=mesh,
            in_specs=(state_specs, batch_specs, P()),
            out_specs=(state_specs, P()),
            check_vma=True,
        ),
        compiler_options=compiler_options,
    )
    return train, evaluate
