"""MLP with the reference's exact (and unusual) semantics.

Reference: utils.py:39-71. Three quirks reproduced deliberately:
  * dropout is applied to the *weight matrices*, not activations;
  * ReLU between layers but the FINAL layer output is the pre-activation
    (`last_hidden` is returned before the trailing ReLU);
  * uniform Glorot init, zero biases.

Default regression heads are single linear layers (`hid_sizes=[]`,
chem_tensorflow.py:153-157).
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ggnn_tpu.ops.dropout import dropout
from ggnn_tpu.utils.init import glorot_init


def mlp_init(key: jax.Array, in_size: int, out_size: int,
             hid_sizes: Sequence[int] = ()) -> List[dict]:
    dims = [in_size] + list(hid_sizes) + [out_size]
    layers = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        layers.append({
            "W": glorot_init(sub, (d_in, d_out)),
            "b": jnp.zeros((d_out,), jnp.float32),
        })
    return layers


def mlp_apply(params: List[dict], inputs: jax.Array, *,
              keep_prob: float = 1.0, rng=None) -> jax.Array:
    acts = inputs
    hid = acts
    for i, layer in enumerate(params):
        W = layer["W"]
        if keep_prob < 1.0:
            if rng is None:
                raise ValueError("weight dropout requires an rng key")
            rng, sub = jax.random.split(rng)
            W = dropout(sub, W, keep_prob)
        hid = jnp.dot(acts, W, preferred_element_type=jnp.float32) + layer["b"]
        acts = jax.nn.relu(hid)
    return hid
