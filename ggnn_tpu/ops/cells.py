"""Recurrent node-update cells with TF 1.3 gate math.

The reference's propagation step feeds aggregated messages into an RNN
cell whose previous state is the node state
(chem_tensorflow_sparse.py:102-115, 215-216). Three cell families are
supported, and their gate equations are reproduced to f32 rounding —
the evaluation is concat-free (the [x; h] @ W product runs as split-K
partial matmuls, see gru_apply), which reassociates the K-sum and can
differ from TF1's single matmul at ~1e-7. This is the `allclose`
contract for per-propagation-step node states (TF1 goldens pin it at
2e-5), NOT a bit-exactness contract:

GRUCell (TF 1.3 tf.nn.rnn_cell.GRUCell):
    [r, u] = sigmoid([x, h] @ W_g + b_g)         b_g initialised to 1.0
    c      = act([x, r * h] @ W_c + b_c)         b_c initialised to 0.0
    h'     = u * h + (1 - u) * c

CudnnCompatibleGRUCell (tf.contrib.cudnn_rnn): same gates, but the reset
gate is applied *after* the recurrent matmul, with separate input/state
candidate kernels and biases (the cuDNN formulation):
    c  = act(x @ W_ci + b_ci + r * (h @ W_ch + b_ch))

BasicRNNCell:
    h' = act([x, h] @ W + b)                     b initialised to 0.0

Kernels use glorot-uniform init (TF1's default variable initializer).
Cells are plain functions over parameter pytrees; the optional
`state_keep_prob` dropout reproduces `tf.nn.rnn_cell.DropoutWrapper`
applied to the outgoing state. The input width may exceed the hidden
width (residual-connection concatenation feeds `(1+R)*H` inputs,
chem_tensorflow_sparse.py:211-216).
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.utils.init import glorot_init


Params = Dict[str, jax.Array]


def _matmul(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- GRU

def gru_init(key: jax.Array, input_size: int, hidden_size: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "gates_kernel": glorot_init(k1, (input_size + hidden_size, 2 * hidden_size)),
        "gates_bias": jnp.ones((2 * hidden_size,), jnp.float32),
        "candidate_kernel": glorot_init(k2, (input_size + hidden_size, hidden_size)),
        "candidate_bias": jnp.zeros((hidden_size,), jnp.float32),
    }


def gru_apply(params: Params, x: jax.Array, h: jax.Array,
              activation: Callable = jnp.tanh) -> jax.Array:
    """Concat-free evaluation of the TF1 gate math: the stored kernels
    keep TF1's [x; h] row layout (checkpoint compatible), but the two
    x-side products run as ONE [*, 3H] matmul and the h-side ones as
    split-kernel matmuls — no [*, 2H] activation concat is ever
    materialised. Algebraically identical (split-K summation rounds
    differently at ~1e-7); measured +2-3% on the dense train step
    (benchmarks/README.md, "dense reassociation"). The w_x weight
    concat below is loop-invariant and costs nothing in a scan body:
    the compiled XLA:TPU HLO of a scan over this cell contains zero
    concatenate ops (probed on a v5e)."""
    d_in = x.shape[-1]
    hdim = h.shape[-1]
    w_g, w_c = params["gates_kernel"], params["candidate_kernel"]
    w_x = jnp.concatenate([w_g[:d_in], w_c[:d_in]], axis=1)  # [d_in, 3H]
    xs = _matmul(x, w_x)
    gates = jax.nn.sigmoid(xs[..., :2 * hdim] + _matmul(h, w_g[d_in:])
                           + params["gates_bias"])
    r, u = jnp.split(gates, 2, axis=-1)
    c = activation(xs[..., 2 * hdim:] + _matmul(r * h, w_c[d_in:])
                   + params["candidate_bias"])
    return u * h + (1.0 - u) * c


# ------------------------------------------- cuDNN-compatible GRU

def cudnn_gru_init(key: jax.Array, input_size: int, hidden_size: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gates_kernel": glorot_init(k1, (input_size + hidden_size, 2 * hidden_size)),
        "gates_bias": jnp.ones((2 * hidden_size,), jnp.float32),
        "candidate_input_kernel": glorot_init(k2, (input_size, hidden_size)),
        "candidate_input_bias": jnp.zeros((hidden_size,), jnp.float32),
        "candidate_hidden_kernel": glorot_init(k3, (hidden_size, hidden_size)),
        "candidate_hidden_bias": jnp.zeros((hidden_size,), jnp.float32),
    }


def cudnn_gru_apply(params: Params, x: jax.Array, h: jax.Array,
                    activation: Callable = jnp.tanh) -> jax.Array:
    d_in = x.shape[-1]
    w_g = params["gates_kernel"]
    gates = jax.nn.sigmoid(_matmul(x, w_g[:d_in]) + _matmul(h, w_g[d_in:])
                           + params["gates_bias"])
    r, u = jnp.split(gates, 2, axis=-1)
    c_x = _matmul(x, params["candidate_input_kernel"]) + params["candidate_input_bias"]
    c_h = _matmul(h, params["candidate_hidden_kernel"]) + params["candidate_hidden_bias"]
    c = activation(c_x + r * c_h)
    return u * h + (1.0 - u) * c


# ---------------------------------------------------------- basic RNN

def rnn_init(key: jax.Array, input_size: int, hidden_size: int) -> Params:
    return {
        "kernel": glorot_init(key, (input_size + hidden_size, hidden_size)),
        "bias": jnp.zeros((hidden_size,), jnp.float32),
    }


def rnn_apply(params: Params, x: jax.Array, h: jax.Array,
              activation: Callable = jnp.tanh) -> jax.Array:
    d_in = x.shape[-1]
    w = params["kernel"]
    return activation(_matmul(x, w[:d_in]) + _matmul(h, w[d_in:])
                      + params["bias"])


# --------------------------------------------------------- dispatcher

_ACTIVATIONS = {"tanh": jnp.tanh, "relu": jax.nn.relu}

_CELLS = {
    "gru": (gru_init, gru_apply),
    "cudnncompatiblegrucell": (cudnn_gru_init, cudnn_gru_apply),
    "rnn": (rnn_init, rnn_apply),
}


def make_cell(cell_type: str, activation_name: str, state_keep_prob: float = 1.0):
    """Return (init_fn, apply_fn) for a named cell/activation combo.

    `apply_fn(params, x, h, *, rng=None, is_training=False)` applies the
    state dropout wrapper when training. Mirrors the config surface of
    chem_tensorflow_sparse.py:102-115 (cell/activation validation
    included: CudnnCompatibleGRUCell requires tanh).
    """
    cell_key = cell_type.lower()
    act_key = activation_name.lower()
    if act_key not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation function type '{activation_name}'.")
    if cell_key not in _CELLS:
        raise ValueError(f"Unknown RNN cell type '{cell_type}'.")
    if cell_key == "cudnncompatiblegrucell" and act_key != "tanh":
        raise ValueError("CudnnCompatibleGRUCell requires tanh activation.")
    activation = _ACTIVATIONS[act_key]
    init_fn, raw_apply = _CELLS[cell_key]

    def apply_fn(params, x, h, *, rng=None, is_training=False):
        new_h = raw_apply(params, x, h, activation)
        if is_training and state_keep_prob < 1.0:
            if rng is None:
                raise ValueError("state dropout requires an rng key")
            new_h = dropout(rng, new_h, state_keep_prob)
        return new_h

    return init_fn, apply_fn
