"""Optimizer: TF1-semantics Adam with per-leaf gradient-norm clipping.

The reference clips each gradient tensor *individually* with
`tf.clip_by_norm` at `clamp_gradient_norm` — not the global norm
(chem_tensorflow.py:185-190) — then applies `tf.train.AdamOptimizer`,
whose update folds the bias corrections into the step size:

    lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
    p   -= lr_t * m / (sqrt(v) + eps)        (m, v uncorrected, eps=1e-8)

`--freeze-graph-model` removes the graph-model subtree from the
trainable set (chem_tensorflow.py:174-182); here the frozen subtree's
updates are zeroed via `optax.multi_transform` so no Adam state advances
for it, matching variable removal.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def clip_by_norm_per_leaf(clip_norm: float, tp_axis: Optional[str] = None,
                          tp_is_sharded: Optional[Callable] = None
                          ) -> optax.GradientTransformation:
    """tf.clip_by_norm per gradient leaf: g * clip / max(||g||, clip).

    Under tensor parallelism (parallel/tp.py) some leaves are sharded
    over mesh axis `tp_axis`; their clip must use the GLOBAL leaf norm
    (the reference clips each full variable, chem_tensorflow.py:185-190),
    so sharded leaves' squared norms are psummed across the axis.
    `tp_is_sharded(path) -> bool` selects them.
    """

    def update_fn(updates, state, params=None):
        del params

        def clip(g, sharded=False):
            sq = jnp.sum(jnp.square(g))
            if sharded and tp_axis is not None:
                sq = jax.lax.psum(sq, tp_axis)
            norm = jnp.sqrt(sq)
            return g * (clip_norm / jnp.maximum(norm, clip_norm))

        if tp_axis is None or tp_is_sharded is None:
            return jax.tree_util.tree_map(clip, updates), state
        clipped = jax.tree_util.tree_map_with_path(
            lambda path, g: clip(g, tp_is_sharded(path)), updates)
        return clipped, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def tf_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with TF1's epsilon placement (eps outside the bias correction)."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"count": jnp.zeros((), jnp.int32), "mu": zeros,
                "nu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state["nu"], updates)
        t = count.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu)
        return new_updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float, clamp_gradient_norm: float,
                   freeze_graph_model: bool = False,
                   label_fn: Optional[Callable] = None,
                   tp_axis: Optional[str] = None,
                   tp_is_sharded: Optional[Callable] = None
                   ) -> optax.GradientTransformation:
    """clip-per-leaf -> TF-Adam, optionally freezing the 'graph' subtree.

    `label_fn` maps the param pytree to {'graph','heads'} labels; the
    default assumes the Runner's {'graph': ..., 'heads': ...} layout.
    `tp_axis`/`tp_is_sharded`: see clip_by_norm_per_leaf (tensor-parallel
    global-norm clipping).
    """
    opt = optax.chain(
        clip_by_norm_per_leaf(clamp_gradient_norm, tp_axis, tp_is_sharded),
        tf_adam(learning_rate),
    )
    if not freeze_graph_model:
        return opt
    if label_fn is None:
        def label_fn(params):
            return {
                "graph": jax.tree_util.tree_map(lambda _: "frozen", params["graph"]),
                "heads": jax.tree_util.tree_map(lambda _: "train", params["heads"]),
            }
    return optax.multi_transform(
        {"train": opt, "frozen": optax.set_to_zero()}, label_fn)
