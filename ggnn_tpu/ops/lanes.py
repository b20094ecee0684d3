"""Compute-lane padding: run H=100 models on 128-lane tiles.

TPU vector registers and MXU tiles are 128 lanes wide in the minor
dimension (f32 tile (8, 128)); the reference's hidden_size=100
(chem_tensorflow.py:26) leaves every activation row at 100/128 lane
occupancy and forces XLA to relayout across the [B,V,T*H] reshapes in
the reassociated dense propagation (models/dense_ggnn.py). This module
zero-pads the COMPUTE layout to the next lane multiple while the stored
parameters stay at the reference shapes ([.,100,.], checkpoint- and
golden-compatible).

Numerics-preserving by construction: padded state lanes stay exactly 0
through every cell —

  GRU       r,u = sigmoid(0)=0.5 on pad lanes (zero kernel cols + zero
            pad bias), candidate = tanh(0) = 0, so
            h' = u*0 + (1-u)*0 = 0;
  cuDNN GRU c = tanh(0 + r*0) = 0, same gate identity;
  RNN       h' = tanh(0) = 0 / relu(0) = 0;
  GCN layer relu(0 + 0) = 0, linear last layer 0;

and zero kernel ROWS mean pad input lanes contribute nothing to real
lanes. Accumulating extra exact-zero terms does not change an f32 sum
(x + 0.0 == x), so outputs match the unpadded path to XLA tiling
rounding (~1e-7, inside every golden tolerance; pinned in
tests/test_models.py::test_lane_padding_matches_unpadded).

Gradients: padding is linear (zero-scatter), so cotangents slice back
to the reference shapes automatically — the optimizer never sees pad
lanes.
"""

from typing import Dict

import jax
import jax.numpy as jnp

LANE = 128


def round_up_lanes(n: int, lane: int = LANE) -> int:
    return ((n + lane - 1) // lane) * lane


def pad_last(x: jax.Array, hp: int) -> jax.Array:
    """Zero-pad the last dim to `hp`."""
    d = x.shape[-1]
    if d == hp:
        return x
    pads = [(0, 0)] * (x.ndim - 1) + [(0, hp - d)]
    return jnp.pad(x, pads)


def pad_row_blocks(w: jax.Array, d: int, hp: int) -> jax.Array:
    """[nb*d, C] -> [nb*hp, C]: widen each d-row block to hp with zero
    rows. Used for cell kernels whose row layout is [x-blocks; h-block]
    (TF1 [x; h] concat order, ops/cells.py) when every block is d wide
    and the padded inputs are hp wide."""
    rows, cols = w.shape
    if d == hp:
        return w
    nb = rows // d
    assert nb * d == rows, (rows, d)
    return jnp.pad(w.reshape(nb, d, cols),
                   ((0, 0), (0, hp - d), (0, 0))).reshape(nb * hp, cols)


def pad_col_groups(w: jax.Array, d: int, hp: int, n_groups: int) -> jax.Array:
    """[..., n_groups*d] -> [..., n_groups*hp]: widen each d-column
    group (e.g. the [r | u] gate halves) to hp with zero columns."""
    if d == hp:
        return w
    lead = w.shape[:-1]
    pads = [(0, 0)] * len(lead) + [(0, 0), (0, hp - d)]
    return jnp.pad(w.reshape(*lead, n_groups, d),
                   pads).reshape(*lead, n_groups * hp)


def pad_edge_weights_flat(w_flat: jax.Array, t: int, d: int,
                          hp: int) -> jax.Array:
    """[t*d, d] type-stacked edge weights -> [t*hp, hp] (zero blocks)."""
    if d == hp:
        return w_flat
    return pad_col_groups(pad_row_blocks(w_flat, d, hp), d, hp, 1)


def pad_cell_params(params: Dict, d: int, hp: int) -> Dict:
    """Pad a cell parameter pytree (ops/cells.py families, detected by
    key set) from hidden width d to compute width hp. Kernel rows are
    treated as uniform d-wide blocks ([x_0 .. x_k; h]), which matches
    both the plain and the residual-concat input layouts
    (models/dense_ggnn.py feeds (1+R) hp-wide input blocks)."""
    if d == hp:
        return params
    out = dict(params)
    if "candidate_kernel" in params:            # TF1 GRUCell
        out["gates_kernel"] = pad_col_groups(
            pad_row_blocks(params["gates_kernel"], d, hp), d, hp, 2)
        out["gates_bias"] = pad_col_groups(params["gates_bias"], d, hp, 2)
        out["candidate_kernel"] = pad_col_groups(
            pad_row_blocks(params["candidate_kernel"], d, hp), d, hp, 1)
        out["candidate_bias"] = pad_last(params["candidate_bias"], hp)
    elif "candidate_input_kernel" in params:    # CudnnCompatibleGRUCell
        out["gates_kernel"] = pad_col_groups(
            pad_row_blocks(params["gates_kernel"], d, hp), d, hp, 2)
        out["gates_bias"] = pad_col_groups(params["gates_bias"], d, hp, 2)
        out["candidate_input_kernel"] = pad_col_groups(
            pad_row_blocks(params["candidate_input_kernel"], d, hp),
            d, hp, 1)
        out["candidate_input_bias"] = pad_last(
            params["candidate_input_bias"], hp)
        out["candidate_hidden_kernel"] = pad_col_groups(
            pad_row_blocks(params["candidate_hidden_kernel"], d, hp),
            d, hp, 1)
        out["candidate_hidden_bias"] = pad_last(
            params["candidate_hidden_bias"], hp)
    elif "kernel" in params:                    # BasicRNNCell
        out["kernel"] = pad_col_groups(
            pad_row_blocks(params["kernel"], d, hp), d, hp, 1)
        out["bias"] = pad_last(params["bias"], hp)
    else:
        raise ValueError(f"unknown cell param keys: {sorted(params)}")
    return out


def resolve_lane_pad(config: Dict, hidden_size: int) -> bool:
    """`lane_pad` config key: True / False / "auto" (default). Auto
    pads whenever the hidden size is off the 128-lane grid. Strings
    other than "auto" raise — bool("false") is True, so a JSON config
    typo like "lane_pad": "off" must not silently ENABLE padding."""
    mode = config.get("lane_pad", "auto")
    if mode == "auto":
        return hidden_size % LANE != 0
    if not isinstance(mode, bool):
        raise ValueError(
            f"lane_pad must be true, false, or \"auto\"; got {mode!r}")
    return mode
