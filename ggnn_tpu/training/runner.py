"""Training runner — the reference's `ChemModel` training framework,
re-built around jitted functional steps.

Reproduced behavior (chem_tensorflow.py:39-307):
  * run id `<timestamp>_<pid>`, resolved-config archive, per-epoch JSON
    log rewritten in place;
  * epoch runner with threaded batch prefetch, graph-weighted loss/MAE
    accumulation, `error_ratio = MAE / chemical_accuracy`, instances/sec;
  * outer loop with patience-based early stopping on the summed
    validation MAE, best-model checkpointing, restore-then-revalidate;
  * `use_graph=False` ablation (zeroes the propagated states);
  * `--freeze-graph-model` (graph subtree excluded from updates).

TPU-first differences: one compiled train step (params donated), batches
are padded pytrees streamed via a host prefetch thread, RNG is an
explicit threaded key (fold_in per step), and metrics come back as a
single small device array per step.
"""

import json
import os
import time
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.data.loader import infer_metadata, load_graphs_json
from ggnn_tpu.models.base import masked_regression_loss
from ggnn_tpu.models.base import init_output_heads
from ggnn_tpu.training.checkpoint import (load_iterator_state,
                                           restore_checkpoint,
                                           save_checkpoint)
from ggnn_tpu.training.optimizer import make_optimizer
from ggnn_tpu.training.summaries import SummarySink
from ggnn_tpu.training.variants import make_adapter
from ggnn_tpu.utils.constants import CHEMICAL_ACCURACIES
from ggnn_tpu.utils.prefetch import ThreadedIterator


def _batch_edge_count(batch) -> float:
    """Real (unpadded) edge count of one batch, any batch type."""
    if hasattr(batch, "edge_mask"):
        return float(np.asarray(batch.edge_mask).sum())
    if hasattr(batch, "adjacency"):
        return float(np.count_nonzero(np.asarray(batch.adjacency)))
    if hasattr(batch, "edge_weights"):
        return float(np.count_nonzero(np.asarray(batch.edge_weights)))
    if hasattr(batch, "msg_targets"):
        # Async: each real edge fires exactly once per round, so edges
        # = real message slots / R. Padded slots carry the per-step
        # receiver dump id RC (graph.py AsyncGraphBatch: "pad -> RC"),
        # where RC is the receiving-node capacity axis.
        mt = np.asarray(batch.msg_targets)
        rc_cap = batch.receiving_nodes.shape[-1]
        return float((mt < rc_cap).sum()) / max(mt.shape[0], 1)
    return 0.0


class Runner:
    def __init__(self, variant: str, config: Dict, *,
                 data_dir: str = "", log_dir: str = ".",
                 restore: Optional[str] = None,
                 freeze_graph_model: bool = False,
                 train_data: Optional[List] = None,
                 valid_data: Optional[List] = None,
                 restrict_data: Optional[int] = None,
                 quiet: bool = False,
                 adapter_kwargs: Optional[Dict] = None,
                 tensorboard: bool = True,
                 mesh=None,
                 profile_dir: Optional[str] = None,
                 save_every_epoch: bool = False,
                 checkpoint_every_steps: int = 0):
        self.variant = variant
        self.config = config
        self.quiet = quiet
        self.data_dir = data_dir
        self.task_ids = list(config["task_ids"])

        # Run management (chem_tensorflow.py:48-54).
        self.run_id = "_".join([time.strftime("%Y-%m-%d-%H-%M-%S"),
                                str(os.getpid())])
        os.makedirs(log_dir, exist_ok=True)
        self.log_file = os.path.join(log_dir, f"{self.run_id}_log.json")
        self.best_model_file = os.path.join(
            log_dir, f"{self.run_id}_model_best.pickle")
        with open(os.path.join(log_dir, f"{self.run_id}_params.json"), "w") as f:
            json.dump(config, f)
        # TB scalars under <log_dir>/tb/<run_id>/{train,validation}
        # (chem_tensorflow.py:53-54,101-102).
        self.summaries = SummarySink(log_dir, self.run_id,
                                     enabled=tensorboard)
        if not quiet:
            print(f"Run {self.run_id} starting with following parameters:\n"
                  f"{json.dumps(config)}")

        seed = config["random_seed"]
        self.np_rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)

        # Data loading + metadata inference (chem_tensorflow.py:104-123).
        if train_data is None:
            train_data = load_graphs_json(
                os.path.join(data_dir, config["train_file"]), restrict_data)
        if valid_data is None:
            valid_data = load_graphs_json(
                os.path.join(data_dir, config["valid_file"]), restrict_data)
        if config.get("locality_reorder", False):
            # DFS-preorder vertex relabeling (data/reorder.py): a pure
            # per-graph relabel that shrinks the contiguous-range cut —
            # and hence the node-sharding boundary exchange — for giant
            # graphs. No effect on results; off by default (molecular
            # corpora don't need it).
            from ggnn_tpu.data.reorder import dfs_reorder
            train_data = [dfs_reorder(g) for g in train_data]
            valid_data = [dfs_reorder(g) for g in valid_data]
        self.meta = infer_metadata([train_data, valid_data],
                                   config["tie_fwd_bkwd"])

        self.adapter = make_adapter(variant, config, self.meta,
                                    **(adapter_kwargs or {}))
        self.train_processed = self.adapter.preprocess(
            train_data, True, self.np_rng)
        self.valid_processed = self.adapter.preprocess(valid_data, False)
        self.adapter.plan(self.train_processed, self.valid_processed)

        # Multi-chip: a jax.sharding.Mesh with ("data", "edge") axes
        # (parallel/mesh.py). Sparse-family variants support the edge
        # axis; dense-family (dense/blocked) are data-parallel only and
        # need a single bucket shape. Each step consumes a stack of
        # n_data packed batches.
        self.mesh = mesh
        self._mesh_kind = None
        if mesh is not None:
            from ggnn_tpu.parallel.mesh import EDGE_AXIS
            n_edge = mesh.shape[EDGE_AXIS]
            if variant in ("sparse", "rgcn"):
                # Two edge-axis strategies (config "edge_parallelism"):
                #   "node_shard" (default) — node-sharded boundary
                #     exchange (parallel/node_shard.py);
                #   "type_tp" — tensor parallelism over the [T, H, H]
                #     edge weights' type axis (parallel/tp.py).
                if (n_edge > 1 and config.get("edge_parallelism",
                                              "node_shard") == "type_tp"):
                    from ggnn_tpu.parallel.tp import validate_tp
                    validate_tp(self.meta.num_edge_types, n_edge)
                    self._mesh_kind = "sparse_tp"
                else:
                    self._mesh_kind = "sparse"
            elif variant in ("dense", "blocked", "gcn_blocked"):
                if n_edge > 1:
                    raise ValueError(
                        "dense-family mesh training is data-parallel "
                        "only (use n_edge=1)")
                self._mesh_kind = "dense"
            elif variant == "gcn":
                # GCN gets the same node-sharded boundary-exchange
                # layout as sparse when the edge axis is active
                # (parallel/node_shard.py GCN section), plain DP
                # otherwise.
                self._mesh_kind = "gcn" if n_edge > 1 else "data_only"
            else:  # async: generic fixed-shape DP
                if n_edge > 1:
                    raise ValueError(
                        f"{variant} mesh training is data-parallel only "
                        "(use n_edge=1)")
                self._mesh_kind = "data_only"

        # Model + parameters.
        if self._mesh_kind in ("sparse", "sparse_tp", "gcn"):
            from ggnn_tpu.parallel.mesh import EDGE_AXIS
            n_edge = mesh.shape[EDGE_AXIS]
            self.model = self.adapter.build_model(
                edge_axis=EDGE_AXIS if n_edge > 1 else None)
        else:
            self.model = self.adapter.build_model()
        self.key, k_graph, k_heads = jax.random.split(self.key, 3)
        params = {
            "graph": self.model.init_params(k_graph),
            "heads": init_output_heads(k_heads, config["hidden_size"],
                                       self.task_ids),
        }
        if self._mesh_kind == "sparse_tp":
            # Clip-by-norm must see the GLOBAL norm of the type-sharded
            # weight leaves (parallel/tp.py).
            from ggnn_tpu.parallel.mesh import EDGE_AXIS
            from ggnn_tpu.parallel.tp import is_tp_sharded_path
            self.optimizer = make_optimizer(
                config["learning_rate"], config["clamp_gradient_norm"],
                freeze_graph_model, tp_axis=EDGE_AXIS,
                tp_is_sharded=is_tp_sharded_path)
        else:
            self.optimizer = make_optimizer(
                config["learning_rate"], config["clamp_gradient_norm"],
                freeze_graph_model)
        opt_state = self.optimizer.init(params)
        self.state = {"params": params, "opt_state": opt_state}

        # jax.profiler trace of the first training epoch (SURVEY §5.1 —
        # the reference has no profiler; wall-clock instances/sec only).
        self.profile_dir = profile_dir
        # Preemption recovery (SURVEY §5.3): beyond the reference's
        # best-on-validation checkpoint, optionally write a rolling
        # "<run_id>_model_last.pickle" after every epoch so an
        # interrupted run resumes from the latest epoch, not the last
        # validation improvement.
        self.save_every_epoch = save_every_epoch
        # Mid-epoch preemption recovery (SURVEY §5.3 resumable iterator
        # state): every K training steps the rolling checkpoint also
        # records the epoch, steps consumed, the numpy RNG state as of
        # the epoch start (the epoch's shuffle seed) and the jax key, so
        # a restore continues the SAME epoch at the SAME batch stream
        # position. Single-chip epochs only (mesh epochs checkpoint at
        # epoch granularity).
        self.checkpoint_every_steps = int(checkpoint_every_steps)
        self.last_model_file = os.path.join(
            log_dir, f"{self.run_id}_model_last.pickle")
        self.train_step_id = 0
        self.valid_step_id = 0
        self._resume_iter = None
        self._epoch_iter_ctx = None
        if restore is not None:
            self.state, self.train_step_id, self.valid_step_id = (
                restore_checkpoint(restore, config, self.state,
                                   variant=variant,
                                   num_edge_types=self.meta.num_edge_types))
            self._resume_iter = load_iterator_state(restore)
        self.restored = restore is not None

        self._nodeshard_caps = None
        self._proc_data_rows = None
        if mesh is not None:
            # Under jax.distributed, feed only THIS host's data rows
            # (parallel/stacking.py:stack_from_process_local) — no host
            # stacks or ships another host's batches, for EVERY mesh
            # kind (sparse/gcn node-shard, dense/blocked DP, async/GCN
            # fixed-shape DP, type-TP). None = replicated global stacks
            # (single process, or non-row-aligned mesh).
            from ggnn_tpu.parallel.mesh import process_aligned_data_rows
            self._proc_data_rows = process_aligned_data_rows(mesh)
        if mesh is not None:
            from ggnn_tpu.parallel.mesh import EDGE_AXIS
            from ggnn_tpu.parallel.step import make_parallel_steps
            template = None
            if self._mesh_kind == "data_only":
                template = next(iter(self.adapter.batches(
                    self.valid_processed, False)))
            if (self._mesh_kind in ("sparse", "gcn")
                    and mesh.shape[EDGE_AXIS] > 1):
                # Node-sharded edge partitioning: size the per-shard
                # edge lanes and boundary-exchange buffers from a dry
                # pack of both splits (shuffle margin included).
                import itertools
                self._nodeshard_caps = self._nodeshard_plan(
                    itertools.chain(
                        self.adapter.batches(self.train_processed, False),
                        self.adapter.batches(self.valid_processed, False)),
                    mesh.shape[EDGE_AXIS])
            # Pure data-parallel sparse meshes keep the type-combined
            # aggregation lane (~3x the per-type layout) — each shard
            # runs the same single-chip math (round-5 review: the lane
            # was stripped on every mesh run, regressing DP sparse).
            self._dp_combined = bool(
                self._mesh_kind == "sparse"
                and mesh.shape[EDGE_AXIS] == 1
                and getattr(self.adapter, "caps", None) is not None
                and getattr(self.adapter.caps, "edges_all", 0) > 0)
            self._train_step, self._eval_step = make_parallel_steps(
                self.model, self.optimizer, config, self.task_ids, mesh,
                batch_kind=self._mesh_kind, batch_template=template,
                state_template=self.state,
                combined_lanes=self._dp_combined)
        else:
            self._train_step = jax.jit(self._make_step(is_training=True),
                                       donate_argnums=(0,))
            self._eval_step = jax.jit(self._make_step(is_training=False))

        # Propagation steps per forward — the edge-messages/s counter
        # multiplier (SURVEY §5.5: first-class throughput metrics).
        if "layer_timesteps" in config:
            self.prop_steps = int(sum(config["layer_timesteps"]))
        elif variant == "async":
            self.prop_steps = int(config["propagation_rounds"])
        else:
            self.prop_steps = int(config["num_timesteps"])

    # ------------------------------------------------------------- steps

    def _loss_fn(self, params, batch, rng, is_training: bool):
        rng_fwd, rng_head = ((None, None) if rng is None
                             else jax.random.split(rng))
        if self.config["use_graph"]:
            final = self.model.forward(params["graph"], batch, rng=rng_fwd,
                                       is_training=is_training)
        else:
            # Ablation: zero the propagated states (chem_tensorflow.py:144-147).
            final = jnp.zeros_like(batch.node_features)
        keep = (self.config["out_layer_dropout_keep_prob"]
                if is_training else 1.0)
        computed = self.model.readout(
            params["heads"], self.task_ids, final, batch,
            keep_prob=keep, rng=rng_head if keep < 1.0 else None)
        loss, accuracies = masked_regression_loss(
            computed, batch.targets, batch.target_mask, self.task_ids,
            self.config["task_sample_ratios"])
        return loss, accuracies

    def _make_step(self, is_training: bool):
        if is_training:
            def step(state, batch, rng):
                (loss, accs), grads = jax.value_and_grad(
                    lambda p: self._loss_fn(p, batch, rng, True),
                    has_aux=True)(state["params"])
                updates, opt_state = self.optimizer.update(
                    grads, state["opt_state"], state["params"])
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, state["params"], updates)
                return {"params": params, "opt_state": opt_state}, loss, accs
            return step

        def step(state, batch, rng):
            loss, accs = self._loss_fn(state["params"], batch, rng, False)
            return state, loss, accs
        return step

    # ------------------------------------------------------------- epochs

    def run_epoch(self, epoch_name: str, processed, is_training: bool):
        """Returns (loss, accuracies, error_ratios, instances/sec, steps)."""
        if self.mesh is not None:
            return self._run_epoch_mesh(epoch_name, processed, is_training)
        chem_acc = CHEMICAL_ACCURACIES[self.task_ids]
        total_loss = 0.0
        accumulated = []
        processed_graphs = 0
        steps = 0
        start_time = time.time()
        step_fn = self._train_step if is_training else self._eval_step
        batch_iter = ThreadedIterator(
            self.adapter.batches(processed, is_training,
                                 self.np_rng if is_training else None),
            max_queue_size=5)
        split = "train" if is_training else "validation"
        step_base = self.train_step_id if is_training else self.valid_step_id
        # Per-step metrics stay ON DEVICE until the epoch ends (one fetch
        # for the whole epoch): a per-batch `float(loss)` would stall the
        # dispatch pipeline on every step — the reference could afford a
        # per-batch sess.run fetch, a TPU pipeline cannot. In verbose
        # mode the progress line forces a fetch per batch (opt-in cost).
        step_metrics = []
        graph_counts = []
        processed_edges = 0.0
        # Mid-epoch resume: reproduce the epoch's batch stream (np_rng
        # was reset to the epoch-start state by train()) and drop the
        # batches the interrupted run already consumed.
        skip_steps = 0
        if is_training and getattr(self, "_skip_steps", 0):
            skip_steps = self._skip_steps
            self._skip_steps = 0
        for step, batch in enumerate(batch_iter):
            if step < skip_steps:
                continue
            num_graphs = int(batch.num_graphs)
            processed_graphs += num_graphs
            processed_edges += _batch_edge_count(batch)
            # Only TRAINING consumes the key chain. Eval dropout is
            # disabled (keep-probs forced to 1.0), so a validation
            # split would be pure stream consumption — and it would
            # break exact-resume under dropout: a mid-epoch restore
            # replays the interrupted epoch from the saved key, but the
            # restore-time "Resumed (validation)" epoch would have
            # advanced the chain past what the uninterrupted run used
            # for the remaining train batches.
            if is_training:
                self.key, rng = jax.random.split(self.key)
            else:
                rng = jax.random.PRNGKey(0)  # unused by the eval step
            batch = jax.device_put(batch)
            self.state, loss, accs = step_fn(self.state, batch, rng)
            step_metrics.append((loss, accs))
            graph_counts.append(num_graphs)
            if not self.quiet:
                total_loss += float(loss) * num_graphs
                print(f"Running {epoch_name}, batch {step} (has {num_graphs} "
                      f"graphs). Loss so far: "
                      f"{total_loss / processed_graphs:.4f}", end="\r")
            steps += 1
            if (is_training and self.checkpoint_every_steps
                    and self._epoch_iter_ctx is not None
                    and steps % self.checkpoint_every_steps == 0):
                save_checkpoint(
                    self.last_model_file, self.config, self.state,
                    self.train_step_id + steps, self.valid_step_id,
                    iterator_state={
                        "epoch": self._epoch_iter_ctx["epoch"],
                        "steps_done": skip_steps + steps,
                        "np_rng_state":
                            self._epoch_iter_ctx["np_rng_state"],
                        "key": np.asarray(self.key),
                    })
        if step_metrics:
            losses = np.asarray(jnp.stack([m[0] for m in step_metrics]))
            accs_all = np.asarray(jnp.stack([m[1] for m in step_metrics]))
            counts = np.asarray(graph_counts, dtype=np.float64)
            total_loss = float(np.sum(losses * counts))
            accumulated = list(accs_all * counts[:, None])
            for i, (l, a) in enumerate(zip(losses, accs_all)):
                self.summaries.add_batch(split, step_base + i, float(l), a,
                                         self.task_ids)
        if processed_graphs == 0:
            hint = ("the corpus split is empty — check the data files "
                    "and any --restrict_data truncation.")
            if getattr(self.adapter, "drop_remainder", False):
                hint = ("with the dense variant's reference-compatible "
                        "remainder dropping, every bucket needs at least "
                        "batch_size graphs (set config \"drop_remainder\": "
                        "false — or use the `blocked` variant — to "
                        "process all).")
            raise RuntimeError(
                f"{epoch_name}: no batches produced — {hint}")
        accuracies = np.sum(accumulated, axis=0) / processed_graphs
        mean_loss = total_loss / processed_graphs
        error_ratios = accuracies / chem_acc
        elapsed = time.time() - start_time
        instance_per_sec = processed_graphs / elapsed
        # edges/s/chip counter (SURVEY §5.5): real edge-messages across
        # all propagation steps per wall-clock second.
        self.last_edge_msg_per_sec = (
            processed_edges * self.prop_steps / elapsed
            if processed_edges else None)
        return mean_loss, accuracies, error_ratios, instance_per_sec, steps

    def _nodeshard_plan(self, batches, n_shards, margin=None,
                        nodes_local=None):
        """Variant-matched node-shard capacity planner (sparse vs GCN
        layouts share NodeShardCaps but count edges differently). Uses
        the packers' tight default margin (`pack_margin` config key,
        1.05): lane occupancy multiplies the per-step gather/scatter
        cost, and a shuffled epoch that still overflows regrows the
        caps instead of dying (see _run_epoch_mesh). `nodes_local`
        pins the owner arithmetic to the ACTIVE caps' layout — a replan
        over a subset of batches is only comparable to those caps under
        the same per-shard node range."""
        from ggnn_tpu.data.packing import DEFAULT_PACK_MARGIN
        from ggnn_tpu.parallel import node_shard
        if margin is None:
            margin = self.config.get("pack_margin") or DEFAULT_PACK_MARGIN
        if self._mesh_kind == "gcn":
            return node_shard.plan_gcn_shard_caps(
                batches, n_shards, margin=margin, nodes_local=nodes_local)
        return node_shard.plan_node_shard_caps(
            batches, n_shards, margin=margin, nodes_local=nodes_local)

    def _nodeshard_stack(self, group, caps, n_data):
        from ggnn_tpu.parallel import node_shard
        # "alltoall" (default): ONE dense collective, pairs padded to
        # the worst pair. "shift": one ppermute per ring shift, each
        # sized to ITS worst pair. "ragged": ONE ragged_all_to_all
        # moving the true per-pair sizes — zero wire padding (TPU
        # only; "ragged_emulated" validates the same layout on CPU).
        # "auto": the lowest-wire-cost transport the backend can run —
        # ragged on TPU, shift elsewhere (XLA:CPU has no
        # ragged-all-to-all kernel). See NodeShardCaps.
        exchange = self._resolve_exchange()
        if self._mesh_kind == "gcn":
            return node_shard.gcn_shard_and_stack(group, caps,
                                                  n_data=n_data,
                                                  exchange=exchange)
        return node_shard.shard_and_stack(group, caps, n_data=n_data,
                                          exchange=exchange)

    def _resolve_exchange(self) -> str:
        exchange = self.config.get("boundary_exchange", "alltoall")
        if exchange == "auto":
            # Resolve from the MESH's devices, not the default backend:
            # a CPU debug mesh on a TPU-equipped host must still get
            # the transport its devices can execute.
            plat = next(iter(self.mesh.devices.flat)).platform
            return "ragged" if plat == "tpu" else "shift"
        return exchange

    def _caps_exceed(self, need, caps) -> bool:
        """True when `need` exceeds `caps` in any field the CONFIGURED
        transport consumes (checking the ragged totals under
        alltoall/shift — or vice versa — would trigger spurious regrow
        replans for capacities never materialized)."""
        exchange = self._resolve_exchange()
        if need.nodes_local > caps.nodes_local \
                or need.edges_local > caps.edges_local \
                or need.edges_boundary > caps.edges_boundary:
            return True
        if exchange == "alltoall":
            return need.boundary > caps.boundary
        if exchange == "shift":
            return any(n > c for n, c in zip(need.boundary_shifts,
                                             caps.boundary_shifts))
        return (need.boundary_send_total > caps.boundary_send_total
                or need.boundary_recv_total > caps.boundary_recv_total)

    @staticmethod
    def _merge_grown_caps(old, grown):
        """Elementwise max of two NodeShardCaps — capacities only ever
        grow, so compiled shapes from earlier groups stay reusable (and
        a later regrow can never shrink a shift lane another group
        needed)."""
        import dataclasses as _dc
        return _dc.replace(
            grown,
            nodes_local=max(grown.nodes_local, old.nodes_local),
            edges_local=max(grown.edges_local, old.edges_local),
            edges_boundary=max(grown.edges_boundary, old.edges_boundary),
            boundary=max(grown.boundary, old.boundary),
            boundary_send_total=max(grown.boundary_send_total,
                                    old.boundary_send_total),
            boundary_recv_total=max(grown.boundary_recv_total,
                                    old.boundary_recv_total),
            boundary_shifts=tuple(
                max(g, o) for g, o in zip(grown.boundary_shifts,
                                          old.boundary_shifts)))

    def _stack_process_local(self, group, n_data, n_edge):
        """Multi-process path: pad the (process-identical) group to
        n_data with no-op fillers, keep only this host's data rows,
        stack them, and assemble the global jax.Array — for every mesh
        kind (node-sharded sparse/gcn, dense/blocked DP, async/GCN
        fixed-shape DP, type-TP). Capacity/shape checks run on the FULL
        group so a regrow decision is identical on every process (a
        process-local regrow would diverge compiled shapes across hosts
        and deadlock the collectives)."""
        from ggnn_tpu.parallel import node_shard, stack_from_process_local
        from ggnn_tpu.parallel.stacking import (data_parallel_specs,
                                                empty_batch_like,
                                                empty_dense_batch_like,
                                                empty_masked_batch_like,
                                                stack_any_batches,
                                                stack_batches,
                                                stack_dense_batches,
                                                stacked_batch_specs,
                                                stacked_dense_batch_specs)
        if len(group) < n_data:
            if self._mesh_kind == "dense":
                filler = empty_dense_batch_like(group[0])
            elif self._mesh_kind in ("sparse", "sparse_tp"):
                filler = empty_batch_like(group[0])
            else:
                filler = empty_masked_batch_like(group[0])
            group = group + [filler] * (n_data - len(group))
        local = [group[i] for i in self._proc_data_rows]
        n_local = len(self._proc_data_rows)
        if self._mesh_kind == "dense":
            # Deterministic cross-host single-bucket check on the FULL
            # group (a local-only check could raise on one host only).
            shapes = {np.asarray(b.node_features).shape for b in group}
            if len(shapes) != 1:
                raise ValueError(
                    f"mesh dense stacking needs one bucket shape, got "
                    f"{shapes}; set dense_bucket_sizes to a single entry")
            stack_local = stack_dense_batches(local, n_data=n_local)
            return stack_from_process_local(stack_local, self.mesh,
                                            stacked_dense_batch_specs())
        if self._mesh_kind == "data_only":
            stack_local = stack_any_batches(local, n_local,
                                            empty_masked_batch_like)
            return stack_from_process_local(stack_local, self.mesh,
                                            data_parallel_specs(stack_local))
        if self._mesh_kind == "sparse_tp":
            from ggnn_tpu.parallel.tp import tp_batch_specs
            # edge_capacity from the FULL group: each host stacks a
            # different subset, and a locally-derived max() could
            # diverge compiled shapes across hosts (round-5 review).
            stack_local = stack_batches(
                local, n_data=n_local,
                edge_capacity=max(b.edge_sources.shape[1]
                                  for b in group))
            return stack_from_process_local(stack_local, self.mesh,
                                            tp_batch_specs())
        if self._nodeshard_caps is not None:
            caps = self._nodeshard_caps
            # Deterministic cross-host overflow check on the FULL group
            # (process-identical inputs -> identical regrow decisions).
            # This re-counts the group's edges once per step — O(group
            # edges) numpy, comparable to the shard relayout itself and
            # the price of never diverging compiled shapes across hosts
            # (the single-process path uses try/except instead).
            need = self._nodeshard_plan(group, caps.n_shards, margin=1.0,
                                        nodes_local=caps.nodes_local)
            if self._caps_exceed(need, caps):
                grown = self._nodeshard_plan(
                    group, caps.n_shards, nodes_local=caps.nodes_local)
                self._nodeshard_caps = self._merge_grown_caps(caps, grown)
                if not self.quiet:
                    print(f"[node-shard] capacity overflow; regrew "
                          f"{caps} -> {self._nodeshard_caps}")
            stack_local = self._nodeshard_stack(
                local, self._nodeshard_caps,
                n_data=len(self._proc_data_rows))
            specs = (node_shard.gcn_sharded_batch_specs(
                         template=stack_local)
                     if self._mesh_kind == "gcn"
                     else node_shard.sharded_batch_specs(
                         template=stack_local))
        else:
            stack_local = stack_batches(
                local, n_data=len(self._proc_data_rows),
                edge_capacity=max(b.edge_sources.shape[1]
                                  for b in group),
                keep_combined=getattr(self, "_dp_combined", False))
            specs = stacked_batch_specs(
                combined=getattr(self, "_dp_combined", False))
        return stack_from_process_local(stack_local, self.mesh, specs)

    def _run_epoch_mesh(self, epoch_name: str, processed, is_training: bool):
        """Multi-chip epoch: stacks of n_data packed batches per step,
        split over the mesh's data axis (edges over the edge axis)."""
        if is_training and getattr(self, "_skip_steps", 0):
            # A mid-epoch iterator state was restored but mesh epochs
            # consume STACKED batches — "skip k single-chip steps" has
            # no aligned meaning here and silently retraining consumed
            # batches would double-count their gradients.
            raise ValueError(
                "restored a mid-epoch iterator state into a mesh Runner: "
                "mesh epochs checkpoint at epoch granularity only. "
                "Resume this checkpoint single-chip to finish the "
                "interrupted epoch, or resume from an epoch-boundary "
                "checkpoint on the mesh.")
        from ggnn_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS
        from ggnn_tpu.parallel.stacking import (empty_masked_batch_like,
                                                stack_any_batches,
                                                stack_batches,
                                                stack_dense_batches)
        n_data = self.mesh.shape[DATA_AXIS]
        n_edge = self.mesh.shape[EDGE_AXIS]
        chem_acc = CHEMICAL_ACCURACIES[self.task_ids]
        split = "train" if is_training else "validation"
        step_base = self.train_step_id if is_training else self.valid_step_id
        step_fn = self._train_step if is_training else self._eval_step
        total_loss, accumulated, processed_graphs, steps = 0.0, [], 0, 0
        step_metrics: List = []
        start_time = time.time()
        batch_iter = ThreadedIterator(
            self.adapter.batches(processed, is_training,
                                 self.np_rng if is_training else None),
            max_queue_size=3 * n_data)
        group: List = []

        def run_group(group):
            nonlocal total_loss, processed_graphs, steps
            already_global = False
            if self._proc_data_rows is not None:
                # Multi-process: this host stacks/ships only its own
                # data rows (all mesh kinds); the leaves are already
                # global jax.Arrays.
                stack = self._stack_process_local(group, n_data, n_edge)
                already_global = True
            elif self._mesh_kind == "dense":
                stack = stack_dense_batches(group, n_data=n_data)
            elif self._mesh_kind == "data_only":
                stack = stack_any_batches(group, n_data,
                                          empty_masked_batch_like)
            elif self._nodeshard_caps is not None:
                try:
                    stack = self._nodeshard_stack(group,
                                                  self._nodeshard_caps,
                                                  n_data=n_data)
                except ValueError:
                    # A reshuffled epoch packed this group beyond the
                    # planned per-shard lane / boundary capacities. Grow
                    # the caps to cover it (margin included) and retry —
                    # one recompile at the new shapes instead of a dead
                    # run (same fallback policy as the packers' ELL
                    # overflow).
                    old = self._nodeshard_caps
                    # No nodes_local pin here: a batch whose node
                    # capacity outgrew the whole S*nl layout (the
                    # _check_node_capacity ValueError) needs a LARGER
                    # per-shard range, which the replan derives.
                    grown = self._nodeshard_plan(group, old.n_shards)
                    if grown.nodes_local < old.nodes_local:
                        grown = self._nodeshard_plan(
                            group, old.n_shards,
                            nodes_local=old.nodes_local)
                    self._nodeshard_caps = self._merge_grown_caps(old,
                                                                  grown)
                    if not self.quiet:
                        print(f"[node-shard] capacity overflow; regrew "
                              f"{old} -> {self._nodeshard_caps}")
                    stack = self._nodeshard_stack(group,
                                                  self._nodeshard_caps,
                                                  n_data=n_data)
            else:
                stack = stack_batches(
                    group, n_data=n_data,
                    keep_combined=getattr(self, "_dp_combined", False))
            # Same key policy as the single-chip path: only training
            # consumes the chain (exact-resume under dropout).
            if is_training:
                self.key, rng = jax.random.split(self.key)
            else:
                rng = jax.random.PRNGKey(0)  # unused by the eval step
            if not already_global and jax.process_count() == 1:
                # Multi-process fallback paths (non-row-aligned mesh,
                # dense/data_only kinds) must pass host arrays
                # UNCOMMITTED: jax.device_put would pin every leaf to
                # one local device, which a jitted shard_map over the
                # global multi-host mesh rejects. Single-process keeps
                # the explicit transfer (overlaps with the epoch loop).
                stack = jax.device_put(stack)
            self.state, metrics = step_fn(self.state, stack, rng)
            # Metrics stay ON DEVICE until the epoch ends (same policy
            # as the single-chip path, runner.py:262): a per-step
            # float(loss) fetch would serialize a host round-trip into
            # the step pipeline. Verbose mode opts into the cost.
            step_metrics.append(metrics)
            steps += 1
            if not self.quiet:
                loss = float(metrics["loss"])
                num_graphs = int(metrics["num_graphs"])
                total_loss += loss * num_graphs
                processed_graphs += num_graphs
                print(f"Running {epoch_name}, step {steps} (has "
                      f"{num_graphs} graphs). Loss so far: "
                      f"{total_loss / max(processed_graphs, 1):.4f}",
                      end="\r")

        for batch in batch_iter:
            group.append(batch)
            if len(group) == n_data:
                run_group(group)
                group = []
        if group:
            run_group(group)  # stacker pads with empty batches
        # ONE host fetch for the whole epoch (losses/accs were devices
        # arrays until now; jnp.stack batches the transfer).
        if step_metrics:
            losses = np.asarray(jnp.stack([m["loss"] for m in step_metrics]))
            accs_all = np.asarray(
                jnp.stack([m["accuracies"] for m in step_metrics]))
            counts = np.asarray(
                jnp.stack([m["num_graphs"] for m in step_metrics]),
                dtype=np.float64)
            total_loss = float(np.sum(losses * counts))
            processed_graphs = int(np.sum(counts))
            accumulated = list(accs_all * counts[:, None])
            for i, (l, a) in enumerate(zip(losses, accs_all)):
                self.summaries.add_batch(split, step_base + i, float(l), a,
                                         self.task_ids)
        if processed_graphs == 0:
            raise RuntimeError(f"{epoch_name}: no batches produced")
        accuracies = np.sum(accumulated, axis=0) / processed_graphs
        mean_loss = total_loss / processed_graphs
        error_ratios = accuracies / chem_acc
        instance_per_sec = processed_graphs / (time.time() - start_time)
        return mean_loss, accuracies, error_ratios, instance_per_sec, steps

    # ------------------------------------------------------------- train

    def train(self):
        log_to_save = []
        total_time_start = time.time()
        if self.restored:
            _, valid_accs, _, _, steps = self.run_epoch(
                "Resumed (validation)", self.valid_processed, False)
            best_val_acc = float(np.sum(valid_accs))
            best_val_acc_epoch = 0
            # The resumed-validation epoch consumed TB global steps;
            # advance the counter or the next validation epoch would
            # overwrite its scalars at identical steps.
            self.valid_step_id += steps
            if not self.quiet:
                print(f"\r\x1b[KResumed operation, initial cum. val. acc: "
                      f"{best_val_acc:.5f}")
        else:
            best_val_acc, best_val_acc_epoch = float("+inf"), 0

        start_epoch = 1
        if self.restored and self._resume_iter is not None:
            start_epoch = int(self._resume_iter["epoch"])
            # Patience counts epochs since the last improvement; a
            # resumed run must get the full window from where it
            # restarts, not epoch-number - 0.
            best_val_acc_epoch = start_epoch - 1
            self.np_rng.set_state(self._resume_iter["np_rng_state"])
            self._skip_steps = int(self._resume_iter["steps_done"])
            if self._resume_iter.get("key") is not None:
                self.key = jnp.asarray(self._resume_iter["key"],
                                       dtype=jnp.uint32)
            # A rolling checkpoint can land exactly on the epoch
            # boundary (checkpoint_every_steps divides the step count):
            # replaying the epoch would skip every batch and die with
            # 'no batches produced'. Count the epoch's stream with a
            # CLONE of the epoch-start rng; if it is fully consumed,
            # advance to the next epoch with the post-shuffle rng state
            # (exactly what the uninterrupted run would have used).
            clone = np.random.RandomState()
            clone.set_state(self._resume_iter["np_rng_state"])
            total_steps = sum(1 for _ in self.adapter.batches(
                self.train_processed, True, clone))
            if self._skip_steps >= total_steps:
                self.np_rng = clone
                start_epoch += 1
                best_val_acc_epoch = start_epoch - 1
                self._skip_steps = 0
                self._resume_iter = None
                if not self.quiet:
                    print(f"Resume checkpoint completed its epoch; "
                          f"continuing at epoch {start_epoch}")
            elif not self.quiet:
                print(f"Resuming mid-epoch: epoch {start_epoch}, "
                      f"skipping {self._skip_steps} consumed batches")
        for epoch in range(start_epoch, self.config["num_epochs"] + 1):
            if not self.quiet:
                print(f"== Epoch {epoch}")
            if not (epoch == start_epoch
                    and self._resume_iter is not None):
                self._epoch_iter_ctx = {
                    "epoch": epoch,
                    "np_rng_state": self.np_rng.get_state()}
            else:
                self._epoch_iter_ctx = {
                    "epoch": epoch,
                    "np_rng_state": self._resume_iter["np_rng_state"]}
            profiling = self.profile_dir is not None and epoch == 1
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
            train_loss, train_accs, train_errs, train_speed, train_steps = (
                self.run_epoch(f"epoch {epoch} (training)",
                               self.train_processed, True))
            if profiling:
                jax.profiler.stop_trace()
            self.train_step_id += train_steps
            if not self.quiet:
                accs_str = " ".join(f"{i}:{a:.5f}" for i, a in
                                    zip(self.task_ids, train_accs))
                errs_str = " ".join(f"{i}:{e:.5f}" for i, e in
                                    zip(self.task_ids, train_errs))
                edge_str = ("" if getattr(self, "last_edge_msg_per_sec",
                                          None) is None else
                            f" | edge-msg/s: "
                            f"{self.last_edge_msg_per_sec:.3g}")
                print(f"\r\x1b[K Train: loss: {train_loss:.5f} | acc: "
                      f"{accs_str} | error_ratio: {errs_str} | "
                      f"instances/sec: {train_speed:.2f}{edge_str}")
            valid_loss, valid_accs, valid_errs, valid_speed, valid_steps = (
                self.run_epoch(f"epoch {epoch} (validation)",
                               self.valid_processed, False))
            self.valid_step_id += valid_steps
            if not self.quiet:
                accs_str = " ".join(f"{i}:{a:.5f}" for i, a in
                                    zip(self.task_ids, valid_accs))
                errs_str = " ".join(f"{i}:{e:.5f}" for i, e in
                                    zip(self.task_ids, valid_errs))
                print(f"\r\x1b[K Valid: loss: {valid_loss:.5f} | acc: "
                      f"{accs_str} | error_ratio: {errs_str} | "
                      f"instances/sec: {valid_speed:.2f}")

            log_to_save.append({
                "epoch": epoch,
                "time": time.time() - total_time_start,
                "train_results": (train_loss, train_accs.tolist(),
                                  train_errs.tolist(), train_speed),
                "valid_results": (valid_loss, valid_accs.tolist(),
                                  valid_errs.tolist(), valid_speed),
            })
            with open(self.log_file, "w") as f:
                json.dump(log_to_save, f, indent=4)
            self.summaries.flush()  # TB scalars reach disk per epoch
            if self.save_every_epoch:
                save_checkpoint(self.last_model_file, self.config,
                                self.state, self.train_step_id,
                                self.valid_step_id)

            val_acc = float(np.sum(valid_accs))
            if val_acc < best_val_acc:
                save_checkpoint(self.best_model_file, self.config, self.state,
                                self.train_step_id, self.valid_step_id)
                if not self.quiet:
                    print(f"  (Best epoch so far, cum. val. acc decreased to "
                          f"{val_acc:.5f} from {best_val_acc:.5f}. Saving to "
                          f"'{self.best_model_file}')")
                best_val_acc = val_acc
                best_val_acc_epoch = epoch
            elif epoch - best_val_acc_epoch >= self.config["patience"]:
                if not self.quiet:
                    print(f"Stopping training after {self.config['patience']} "
                          f"epochs without improvement on validation accuracy.")
                break
        return log_to_save

    def train_on_device(self, num_epochs: int) -> float:
        """Compiled multi-epoch training: the entire epoch loop runs on
        device (`lax.scan` over prepacked batch stacks inside a
        `fori_loop` over epochs) with a single host round-trip at the
        end — the production fast path when per-epoch logging, patience
        and reshuffling aren't needed (utils/timing.py harness; this is
        exactly what bench.py measures). Batch composition is shuffled
        once and fixed across epochs. Updates `self.state`; returns the
        final step's loss.
        """
        if self.mesh is not None:
            raise ValueError("train_on_device is single-device; mesh "
                             "training uses train()")
        from ggnn_tpu.parallel.stacking import stack_any_batches
        from ggnn_tpu.utils.timing import make_epochs_fn

        batches = list(self.adapter.batches(self.train_processed, True,
                                            self.np_rng))
        groups: Dict = {}
        for b in batches:
            shape_key = tuple(np.asarray(l).shape
                              for l in jax.tree_util.tree_leaves(b))
            groups.setdefault(shape_key, []).append(b)
        stacked = [jax.device_put(stack_any_batches(g, 1))
                   for g in groups.values()]
        self.key, base = jax.random.split(self.key)
        key_groups = [jax.device_put(jax.random.split(
            jax.random.fold_in(base, i), len(g)))
            for i, g in enumerate(groups.values())]

        inner = self._make_step(is_training=True)

        def step(state, batch, key):
            state, loss, _ = inner(state, batch, key)
            return state, loss

        epochs_fn = make_epochs_fn(step)
        self.state, loss = epochs_fn(self.state, stacked, key_groups,
                                     num_epochs)
        loss = float(loss)
        self.train_step_id += num_epochs * len(batches)
        return loss

    # ------------------------------------------------------------- eval

    def predict(self, raw_graphs) -> List[np.ndarray]:
        """Model outputs for raw graphs — the reference's
        `evaluate_one_batch` path with all keep-probs at 1.0.

        The forward+readout is jitted once per Runner (per packed batch
        shape); repeated predict calls reuse the compiled executable.
        """
        if getattr(self, "_predict_fn", None) is None:
            # Mesh-trained models contain edge-axis collectives that
            # only exist inside shard_map; inference runs single-device
            # on a collective-free copy (params are replicated). Built
            # once — the jitted closure captures it.
            model = self.model
            if self.mesh is not None and getattr(model, "edge_axis", None):
                model = self.adapter.build_model()

            use_graph = self.config["use_graph"]

            def _predict(params, batch):
                # use_graph=False ablation (chem_tensorflow.py:144-147):
                # the readout must see ZEROED final states, exactly as
                # the training loss did — running the forward through
                # the never-trained graph params would produce outputs
                # unrelated to the reported metrics.
                if use_graph:
                    final = model.forward(params["graph"], batch)
                else:
                    final = jnp.zeros_like(batch.node_features)
                return model.readout(params["heads"], self.task_ids,
                                     final, batch)
            self._predict_fn = jax.jit(_predict)
        # The dense parity variant drops bucket remainders during
        # training epochs (reference quirk); inference must predict
        # every requested graph, so remainder dropping is suspended.
        saved_drop = getattr(self.adapter, "drop_remainder", None)
        if saved_drop is not None:
            self.adapter.drop_remainder = False
        try:
            processed = self.adapter.preprocess(raw_graphs, False)
            order = self._dense_request_order(processed)
            outputs = []
            for batch in self.adapter.batches(processed, False):
                batch = jax.device_put(batch)
                computed = self._predict_fn(self.state["params"], batch)
                n = int(batch.num_graphs)
                outputs.append(np.asarray(computed)[:, :n])
        finally:
            if saved_drop is not None:
                self.adapter.drop_remainder = saved_drop
        if order is not None:
            # Dense bucketing re-orders graphs; scatter outputs back to
            # REQUEST order (same contract as serving.Predictor) so row
            # i is raw_graphs[i]'s prediction.
            packed = np.concatenate(outputs, axis=1)
            result = np.empty_like(packed)
            result[:, np.asarray(order)] = packed
            return [result]
        return outputs

    def _dense_request_order(self, processed):
        """Request-index order of the packed dense-family graphs, or
        None when packing preserves request order (sparse/gcn/async
        pack sequentially). Mirrors serving.Predictor._call_dense."""
        if getattr(self.adapter, "drop_remainder", None) is None:
            return None  # not the dense family
        try:
            from ggnn_tpu.data import native_pack
            if isinstance(processed, native_pack.DenseProcessed):
                order = [int(i) for ids in processed.bucket_order
                         for i in ids]
            else:
                order = [int(g["graph_id"]) for bucket in
                         processed.values() for g in bucket]
        except (AttributeError, KeyError, TypeError):
            return None  # unexpected processed shape: keep pack order
        return order

    def example_evaluation(self, valid_file: Optional[str] = None,
                           n_example_molecules: int = 10,
                           example_molecules: Optional[List] = None):
        """Reference example_evaluation (sparse.py:364-376)."""
        if example_molecules is None:
            if valid_file is None:
                # Same path resolution as training data loading
                # (chem_tensorflow.py:104): valid_file lives in data_dir.
                valid_file = os.path.join(self.data_dir,
                                          self.config["valid_file"])
            with open(valid_file, "r") as f:
                example_molecules = json.load(f)[:n_example_molecules]
        for mol in example_molecules:
            print(mol["targets"])
        for out in self.predict(example_molecules):
            print(out)
