"""Masked segment reductions over padded edge/node arrays.

These are the TPU equivalents of `tf.unsorted_segment_{sum,max}`
(chem_tensorflow_sparse.py:180-200). Padded lanes follow the GraphBatch
convention: their segment id points at a dump slot one past the real
capacity, so reductions allocate `num_segments = capacity + 1` and the
caller slices the dump row off. XLA lowers these to efficient on-chip
scatter-adds; the Pallas path (ops/pallas) fuses them into the message
matmul for the hot loop.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(scores: jax.Array, segment_ids: jax.Array,
                    num_segments: int, mask: jax.Array,
                    epsilon: float,
                    axis_name: Optional[str] = None,
                    indices_are_sorted: bool = False) -> jax.Array:
    """Softmax over ragged incoming-message groups, log-sum-exp shifted.

    Reproduces the reference's manual segment softmax
    (chem_tensorflow_sparse.py:177-194): per-target max shift, exp,
    per-target sum, normalise with `epsilon` in the denominator. `mask`
    (1.0 = real lane) keeps padded lanes out of both reductions: masked
    lanes contribute -inf to the max and 0 to the sum.

    When the edge set is partitioned across a mesh axis (`axis_name`
    inside `shard_map`), each shard sees only its local slice of every
    target's incoming set; the per-segment max and sum become
    cross-shard collectives (pmax / psum over ICI) so the softmax is
    exact over the full incoming set.
    """
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(mask > 0, scores, neg_inf)
    seg_max = segment_max(masked_scores, segment_ids, num_segments,
                          indices_are_sorted=indices_are_sorted)
    # The reference differentiates through unsorted_segment_max
    # (chem_tensorflow_sparse.py:180), but a softmax is invariant to the
    # shift, so that gradient path contributes exactly zero (up to the
    # epsilon in the denominator); stop_gradient is mathematically
    # equivalent and required for pmax (no differentiation rule).
    seg_max = jax.lax.stop_gradient(seg_max)
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    # Segments with no real lanes come back as -inf/min; clamp for safety.
    seg_max = jnp.maximum(seg_max, neg_inf / 2)
    shifted = masked_scores - seg_max[segment_ids]
    exped = jnp.exp(shifted) * mask
    seg_sum = segment_sum(exped, segment_ids, num_segments,
                          indices_are_sorted=indices_are_sorted)
    if axis_name is not None:
        seg_sum = jax.lax.psum(seg_sum, axis_name)
    return exped / (seg_sum[segment_ids] + epsilon)
