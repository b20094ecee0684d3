"""Typed-edge message passing — the framework's hot compute path.

One propagation step of the sparse GGNN
(chem_tensorflow_sparse.py:153-216) decomposes into:
  1. gather source node states per edge type            [T, E, H]
  2. per-type dense transform (batched matmul on MXU)   [T, E, H]
  3. optional segment-softmax propagation attention
  4. segment-sum aggregation into target nodes          [N, H]
  5. optional edge bias / in-degree averaging

Steps 1-2 are expressed as one `einsum('teh,thd->ted')` so XLA maps all
edge types onto the MXU as a single batched matmul; step 4 is a masked
segment-sum into the dump-slot layout of `GraphBatch`. A Pallas kernel
fusing 1+2+4 over a blocked-ELL layout exists in ops/pallas/ell_spmm.py
but is ARCHIVED (not reachable from any config): measurement pinned the
edge-list path to an ~18 ns/row issue-bound floor that the fused kernel
cannot beat on this hardware — see benchmarks/README.md.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ggnn_tpu.ops.segment import segment_sum, segment_softmax
from ggnn_tpu.utils.constants import SMALL_NUMBER


def typed_edge_messages(node_states: jax.Array, edge_sources: jax.Array,
                        edge_weights: jax.Array) -> jax.Array:
    """Gather + transform: returns per-type messages [T, E, H].

    node_states [N, H]; edge_sources [T, E] int32; edge_weights [T, H, H].
    """
    src_states = node_states[edge_sources]          # [T, E, H]
    return jnp.einsum(
        "teh,thd->ted", src_states, edge_weights,
        preferred_element_type=jnp.float32,
    )


def aggregate_messages(messages: jax.Array, edge_targets: jax.Array,
                       node_capacity: int) -> jax.Array:
    """Segment-sum flattened typed messages into nodes. Returns [N, H].

    `edge_targets` uses the dump-slot convention (padding -> N), so the
    reduction allocates N+1 segments and slices the dump row off.
    """
    t, e, h = messages.shape
    flat_msgs = messages.reshape(t * e, h)
    flat_targets = edge_targets.reshape(t * e)
    summed = segment_sum(flat_msgs, flat_targets, node_capacity + 1)
    return summed[:node_capacity]


def _edge_scores(node_states, sources, targets, node_capacity,
                 per_edge_factor):
    """<src, tgt> dot-product score per edge, scaled by a per-edge
    factor, in f32 regardless of compute dtype. Padded targets point at
    the DUMP slot (node_capacity), which has no state row — they are
    clamped to node_capacity - 1 (any valid row: padded lanes' scores
    are masked out of the softmax by the caller). Shared by all three
    attention entry points so the clamp/score/scale recipe cannot
    drift (round-5 review)."""
    src_states = node_states[sources]
    safe_targets = jnp.minimum(targets, node_capacity - 1)
    tgt_states = node_states[safe_targets]
    scores = jnp.sum((src_states * tgt_states).astype(jnp.float32),
                     axis=-1)
    return scores * per_edge_factor


def propagation_attention_weights(node_states: jax.Array,
                                  edge_sources: jax.Array,
                                  edge_targets: jax.Array,
                                  edge_mask: jax.Array,
                                  type_factors: jax.Array,
                                  node_capacity: int,
                                  edge_axis: Optional[str] = None
                                  ) -> jax.Array:
    """Per-edge attention weights [T, E] (segment-softmax of <src,tgt>
    scores scaled per type, chem_tensorflow_sparse.py:170-196). Scores
    are a function of node *states* only, so the weights can be applied
    to gathered source rows before aggregation (see
    `aggregate_then_transform`) instead of to transformed messages —
    identical math, since the transform is linear."""
    t, e = edge_sources.shape
    scores = _edge_scores(node_states, edge_sources, edge_targets,
                          node_capacity, type_factors[:, None])  # [T, E]
    # exp/normalise in f32 even under a bf16 compute dtype.
    attention = segment_softmax(
        scores.reshape(t * e), edge_targets.reshape(t * e),
        node_capacity + 1, edge_mask.reshape(t * e), SMALL_NUMBER,
        axis_name=edge_axis,
    )
    return attention.reshape(t, e)


def aggregate_then_transform(node_states: jax.Array,
                             edge_sources: jax.Array,
                             edge_targets: jax.Array,
                             edge_weights: jax.Array,
                             node_capacity: int,
                             attention: Optional[jax.Array] = None,
                             targets_sorted: bool = False) -> jax.Array:
    """One propagation step's incoming activations [N, H], computed as
    aggregate-BEFORE-transform.

    The per-edge message transform is linear, so
        sum_e a_e * (H[src_e] @ W_t)  ==  (sum_e a_e * H[src_e]) @ W_t.
    The reference transforms each edge then aggregates
    (chem_tensorflow_sparse.py:153-201: per-edge matmul, segment-sum);
    aggregating first shrinks the matmul from [T,E,H]x[T,H,H] to
    [T,N,H]x[T,H,H] (QM9 packed batches have E ≈ 2N per type in total)
    and avoids materialising the [T,E,H] message tensor — on TPU the
    step becomes one MXU-batched [T,N,H] matmul plus a gather/scatter
    whose traffic is the floor for any implementation. Float summation
    order differs from the reference (sum-then-multiply), within normal
    f32 reduction tolerance.
    """
    gathered = node_states[edge_sources]            # [T, E, H]
    if attention is not None:
        gathered = gathered * attention[..., None]
    # `targets_sorted`: the packers emit per-type lanes sorted by target
    # (padding lands at the dump slot N, the largest id, so sortedness
    # holds through the padding) — XLA's sorted-scatter path is ~1.5x
    # the unsorted one on TPU. Only valid for packer-built batches.
    per_type = jax.vmap(
        lambda data, seg: segment_sum(data, seg, node_capacity + 1,
                                      indices_are_sorted=targets_sorted)
    )(gathered, edge_targets)                       # [T, N+1, H]
    per_type = per_type[:, :node_capacity]
    return jnp.einsum("tnh,thd->nd", per_type, edge_weights,
                      preferred_element_type=jnp.float32)



def propagation_attention_weights_combined(node_states: jax.Array,
                                           src_all: jax.Array,
                                           tgt_all: jax.Array,
                                           mask_all: jax.Array,
                                           type_all: jax.Array,
                                           type_factors: jax.Array,
                                           node_capacity: int) -> jax.Array:
    """Per-edge attention weights [EA] on the type-combined lane — same
    math as propagation_attention_weights (the softmax groups by TARGET
    only, so combining types changes nothing)."""
    scores = _edge_scores(node_states, src_all, tgt_all, node_capacity,
                          type_factors[type_all])
    # The combined lane is (target, type)-sorted (packer contract), so
    # target ids are monotone: XLA's sorted-scatter path applies to the
    # softmax's two segment reductions too.
    return segment_softmax(scores, tgt_all, node_capacity + 1, mask_all,
                           SMALL_NUMBER, indices_are_sorted=True)


def aggregate_then_transform_combined(node_states: jax.Array,
                                      src_all: jax.Array,
                                      type_all: jax.Array,
                                      tgt_all: jax.Array,
                                      edge_weights: jax.Array,
                                      node_capacity: int,
                                      attention: jax.Array = None
                                      ) -> jax.Array:
    """One propagation step's incoming activations [N, H] over the
    type-COMBINED edge lane (GraphBatch.edge_*_all).

    Identical math to `aggregate_then_transform`; the per-(type, target)
    partial sums come from ONE sorted segment-sum over the composite id
    target*T + type (the lane is (target, type)-sorted by the packer
    contract). Bond-type skew makes per-type lanes ~22% occupied while
    the combined lane is ~68% — 3.1x less gather/scatter work, which is
    the dominant cost of the step (see benchmarks/README.md round-2
    conclusion: the per-edge row access is the floor, so touch 3x fewer
    padded rows).
    """
    t_dim = edge_weights.shape[0]
    gathered = node_states[src_all]                     # [EA, H]
    if attention is not None:
        gathered = gathered * attention[:, None]
    comp = tgt_all * t_dim + type_all
    per = segment_sum(gathered, comp, (node_capacity + 1) * t_dim,
                      indices_are_sorted=True)
    per = per.reshape(node_capacity + 1, t_dim, -1)[:node_capacity]
    return jnp.einsum("nth,thd->nd", per, edge_weights,
                      preferred_element_type=jnp.float32)


def propagation_attention(messages: jax.Array, node_states: jax.Array,
                          edge_sources: jax.Array, edge_targets: jax.Array,
                          edge_mask: jax.Array, type_factors: jax.Array,
                          node_capacity: int,
                          edge_axis: Optional[str] = None) -> jax.Array:
    """Segment-softmax attention over incoming messages.

    Reproduces chem_tensorflow_sparse.py:170-196: score = <src, tgt>
    scaled by a per-edge-type factor, softmaxed over each target's
    incoming set (log-sum-exp trick), messages reweighted. Padded edge
    lanes are masked out of both the max and the sum. With edges
    partitioned over mesh axis `edge_axis`, the segment reductions
    become cross-shard collectives (see ops/segment.py).
    """
    t, e, h = messages.shape
    scores = _edge_scores(node_states, edge_sources, edge_targets,
                          node_capacity, type_factors[:, None])  # [T, E]
    flat_scores = scores.reshape(t * e)
    flat_targets = edge_targets.reshape(t * e)
    flat_mask = edge_mask.reshape(t * e)
    attention = segment_softmax(
        flat_scores, flat_targets, node_capacity + 1, flat_mask, SMALL_NUMBER,
        axis_name=edge_axis,
    )
    return messages * attention.reshape(t, e)[..., None]


def average_by_in_degree(incoming: jax.Array, in_degrees: jax.Array) -> jax.Array:
    """Divide aggregated messages by total in-degree (+ epsilon).

    Reproduces `use_edge_msg_avg_aggregation`
    (chem_tensorflow_sparse.py:206-209).
    """
    num_incoming = jnp.sum(in_degrees, axis=-1, keepdims=True)  # [N, 1]
    return incoming / (num_incoming + SMALL_NUMBER)


def edge_bias_term(in_degrees: jax.Array, edge_biases: jax.Array) -> jax.Array:
    """Per-node bias: in-degree counts [N, T] @ biases [T, H] -> [N, H].

    Reproduces `use_edge_bias` (chem_tensorflow_sparse.py:202-204).
    """
    return jnp.dot(in_degrees, edge_biases, preferred_element_type=jnp.float32)
