"""Golden tests for the TF1.3-math recurrent cells against a NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggnn_tpu.ops import (
    gru_init, gru_apply, cudnn_gru_init, cudnn_gru_apply,
    rnn_init, rnn_apply, make_cell,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_gru(params, x, h, act=np.tanh):
    """TF 1.3 GRUCell oracle: gates over [x,h] with bias-1 init; candidate
    over [x, r*h]; new_h = u*h + (1-u)*c."""
    xh = np.concatenate([x, h], axis=-1)
    gates = _sigmoid(xh @ np.asarray(params["gates_kernel"]) +
                     np.asarray(params["gates_bias"]))
    r, u = np.split(gates, 2, axis=-1)
    xrh = np.concatenate([x, r * h], axis=-1)
    c = act(xrh @ np.asarray(params["candidate_kernel"]) +
            np.asarray(params["candidate_bias"]))
    return u * h + (1 - u) * c


def np_cudnn_gru(params, x, h):
    xh = np.concatenate([x, h], axis=-1)
    gates = _sigmoid(xh @ np.asarray(params["gates_kernel"]) +
                     np.asarray(params["gates_bias"]))
    r, u = np.split(gates, 2, axis=-1)
    c = np.tanh(
        x @ np.asarray(params["candidate_input_kernel"])
        + np.asarray(params["candidate_input_bias"])
        + r * (h @ np.asarray(params["candidate_hidden_kernel"])
               + np.asarray(params["candidate_hidden_bias"]))
    )
    return u * h + (1 - u) * c


def test_gru_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    params = gru_init(key, 7, 5)
    x = np.random.RandomState(1).randn(4, 7).astype(np.float32)
    h = np.random.RandomState(2).randn(4, 5).astype(np.float32)
    got = gru_apply(params, jnp.array(x), jnp.array(h))
    want = np_gru(params, x, h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_gru_gate_bias_is_one():
    params = gru_init(jax.random.PRNGKey(0), 3, 3)
    assert np.all(np.asarray(params["gates_bias"]) == 1.0)
    assert np.all(np.asarray(params["candidate_bias"]) == 0.0)


def test_gru_relu_activation():
    params = gru_init(jax.random.PRNGKey(0), 5, 5)
    x = np.random.RandomState(3).randn(2, 5).astype(np.float32)
    h = np.random.RandomState(4).randn(2, 5).astype(np.float32)
    got = gru_apply(params, jnp.array(x), jnp.array(h), activation=jax.nn.relu)
    want = np_gru(params, x, h, act=lambda v: np.maximum(v, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_cudnn_gru_matches_numpy_oracle():
    params = cudnn_gru_init(jax.random.PRNGKey(1), 5, 5)
    x = np.random.RandomState(5).randn(3, 5).astype(np.float32)
    h = np.random.RandomState(6).randn(3, 5).astype(np.float32)
    got = cudnn_gru_apply(params, jnp.array(x), jnp.array(h))
    want = np_cudnn_gru(params, x, h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_basic_rnn():
    params = rnn_init(jax.random.PRNGKey(2), 4, 3)
    x = np.random.RandomState(7).randn(2, 4).astype(np.float32)
    h = np.random.RandomState(8).randn(2, 3).astype(np.float32)
    got = rnn_apply(params, jnp.array(x), jnp.array(h))
    xh = np.concatenate([x, h], axis=-1)
    want = np.tanh(xh @ np.asarray(params["kernel"]) + np.asarray(params["bias"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_make_cell_validation():
    with pytest.raises(ValueError):
        make_cell("bogus", "tanh")
    with pytest.raises(ValueError):
        make_cell("gru", "bogus")
    with pytest.raises(ValueError):
        make_cell("CudnnCompatibleGRUCell", "ReLU")
    # Reference-legal combos:
    make_cell("GRU", "tanh")
    make_cell("GRU", "ReLU")
    make_cell("RNN", "ReLU")
    make_cell("CudnnCompatibleGRUCell", "tanh")


def test_state_dropout_only_when_training():
    init_fn, apply_fn = make_cell("gru", "tanh", state_keep_prob=0.5)
    params = init_fn(jax.random.PRNGKey(0), 5, 5)
    x = jnp.ones((8, 5))
    h = jnp.zeros((8, 5))
    eval_out = apply_fn(params, x, h, is_training=False)
    train_out = apply_fn(params, x, h, rng=jax.random.PRNGKey(3), is_training=True)
    # Eval path: deterministic, no zeros expected in general.
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # Dropped lanes are exact zeros; kept lanes scaled by 2.
    t = np.asarray(train_out)
    e = np.asarray(eval_out)
    dropped = t == 0.0
    assert dropped.any()
    np.testing.assert_allclose(t[~dropped], 2.0 * e[~dropped], rtol=1e-5)
