"""Tests for MLP, dropout, segment ops and typed message passing."""

import numpy as np
import jax
import jax.numpy as jnp

from ggnn_tpu.ops import mlp_init, mlp_apply, segment_softmax
from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.ops.messages import (
    typed_edge_messages, aggregate_messages, average_by_in_degree,
    edge_bias_term, propagation_attention,
)
from ggnn_tpu.utils.constants import SMALL_NUMBER


def test_mlp_final_layer_is_linear():
    """Reference MLP returns pre-activation of the last layer (utils.py:70)."""
    params = mlp_init(jax.random.PRNGKey(0), 4, 1, hid_sizes=[8])
    x = np.random.RandomState(0).randn(5, 4).astype(np.float32)
    got = np.asarray(mlp_apply(params, jnp.array(x)))
    h = np.maximum(x @ np.asarray(params[0]["W"]) + np.asarray(params[0]["b"]), 0)
    want = h @ np.asarray(params[1]["W"]) + np.asarray(params[1]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got < 0).any()  # linear output can go negative


def test_dropout_semantics():
    x = jnp.ones((1000,))
    y = np.asarray(dropout(jax.random.PRNGKey(0), x, 0.8))
    kept = y != 0
    np.testing.assert_allclose(y[kept], 1.0 / 0.8, rtol=1e-6)
    assert 0.7 < kept.mean() < 0.9
    # keep_prob 1.0 is identity (compiled away)
    assert dropout(jax.random.PRNGKey(0), x, 1.0) is x


def test_dropout_mask_is_flat_order_invariant():
    """models/dense_ggnn.py draws weight dropout on the hoisted
    [T*H, H] view of the [T, H, H] weights (keeps the backward's flat
    cotangent layout); that is numerics-identical because jax PRNG
    bits are generated in flat element order, pinned here."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(jax.random.PRNGKey(4), (4, 6, 6))
    a = np.asarray(dropout(key, w, 0.8)).reshape(24, 6)
    b = np.asarray(dropout(key, w.reshape(24, 6), 0.8))
    np.testing.assert_array_equal(a, b)


def test_typed_messages_and_aggregation():
    # 3 nodes, 2 edge types. Type 0: 0->1, 1->2; type 1: 2->0 (+1 padded).
    h = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    n_cap = 3
    edge_sources = jnp.array([[0, 1], [2, 0]], dtype=jnp.int32)
    edge_targets = jnp.array([[1, 2], [0, n_cap]], dtype=jnp.int32)
    w = jnp.stack([2 * jnp.eye(2), 3 * jnp.eye(2)])
    msgs = typed_edge_messages(h, edge_sources, w)
    np.testing.assert_allclose(np.asarray(msgs[0, 0]), [2.0, 0.0])
    np.testing.assert_allclose(np.asarray(msgs[1, 0]), [3.0, 3.0])
    agg = aggregate_messages(msgs, edge_targets, n_cap)
    assert agg.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(agg[1]), [2.0, 0.0])  # from node 0
    np.testing.assert_allclose(np.asarray(agg[2]), [0.0, 2.0])  # from node 1
    np.testing.assert_allclose(np.asarray(agg[0]), [3.0, 3.0])  # from node 2
    # padded edge (source 0, dump target) contributed nowhere


def test_average_and_edge_bias():
    incoming = jnp.array([[4.0, 4.0], [0.0, 0.0]])
    in_deg = jnp.array([[2.0, 0.0], [0.0, 0.0]])
    avg = np.asarray(average_by_in_degree(incoming, in_deg))
    np.testing.assert_allclose(avg[0], 4.0 / (2.0 + SMALL_NUMBER), rtol=1e-6)
    np.testing.assert_allclose(avg[1], 0.0)
    biases = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    bias = np.asarray(edge_bias_term(in_deg, biases))
    np.testing.assert_allclose(bias[0], [2.0, 0.0])


def test_segment_softmax_matches_dense_softmax():
    scores = jnp.array([1.0, 2.0, 3.0, 100.0])
    seg = jnp.array([0, 0, 1, 2], dtype=jnp.int32)  # seg 2 = dump
    mask = jnp.array([1.0, 1.0, 1.0, 0.0])
    att = np.asarray(segment_softmax(scores, seg, 3, mask, SMALL_NUMBER))
    want01 = np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum()
    np.testing.assert_allclose(att[:2], want01, rtol=1e-5)
    np.testing.assert_allclose(att[2], 1.0, rtol=1e-5)
    assert att[3] == 0.0  # masked lane


def test_propagation_attention_uniform_when_scores_equal():
    # Two identical incoming edges to node 0 -> attention 0.5 each.
    h = jnp.ones((2, 3))
    n_cap = 2
    src = jnp.array([[0, 1]], dtype=jnp.int32)
    tgt = jnp.array([[0, 0]], dtype=jnp.int32)
    mask = jnp.ones((1, 2))
    w = jnp.stack([jnp.eye(3)])
    msgs = typed_edge_messages(h, src, w)
    out = propagation_attention(msgs, h, src, tgt, mask,
                                jnp.ones(1), n_cap)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(msgs),
                               rtol=1e-5)


def test_dropout_rejects_nonpositive_keep_prob():
    """tf.nn.dropout semantics: keep_prob must be in (0, 1] — a config
    typo of 0.0 must fail fast, not train a zeroed network."""
    import pytest

    from ggnn_tpu.ops.dropout import dropout

    with pytest.raises(ValueError, match="keep_prob"):
        dropout(jax.random.PRNGKey(0), jnp.ones((3, 3)), 0.0)
