"""Dropout with TF1 `tf.nn.dropout` semantics.

TF1 keeps each element with probability `keep_prob` and scales the kept
elements by `1/keep_prob`. The reference applies dropout to *weight
matrices* (utils.py:68, chem_tensorflow_sparse.py:91), to RNN output
states (`DropoutWrapper(state_keep_prob=...)`) and to GCN activations —
all with this same primitive.

`keep_prob` is treated as a static python float: 1.0 compiles to identity.
"""

import jax
import jax.numpy as jnp


def dropout(key, x: jax.Array, keep_prob: float) -> jax.Array:
    if keep_prob >= 1.0:
        return x
    if keep_prob <= 0.0:
        # tf.nn.dropout raises for keep_prob outside (0, 1]; silently
        # zeroing everything would let a config typo (0.0 for 1.0)
        # train a dead network to completion.
        raise ValueError(f"keep_prob must be in (0, 1], got {keep_prob}")
    # TF1 formulation: binary mask = floor(keep_prob + U[0,1)).
    mask = jax.random.bernoulli(key, p=keep_prob, shape=x.shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))
