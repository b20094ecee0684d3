"""Parameter initializers.

The reference initializes edge-transform weights with a uniform Glorot
scheme (reference: utils.py:11-13 and utils.py:62-63 — both draw uniformly
from ±sqrt(6/(fan_in+fan_out))). GRU/RNN kernels use TF1's default
glorot-uniform and gate biases start at 1.0 (TF 1.3 GRUCell `_linear`
bias_ones); we reproduce those choices so training dynamics match.

All initializers take a `jax.random` key and return f32 arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np


def glorot_init(key: jax.Array, shape) -> jax.Array:
    """Uniform Glorot over the last two dims, matching utils.py:11-13."""
    limit = np.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(
        key, shape, minval=-limit, maxval=limit, dtype=jnp.float32
    )


def zeros_init(_key: jax.Array, shape) -> jax.Array:
    return jnp.zeros(shape, dtype=jnp.float32)


def ones_init(_key: jax.Array, shape) -> jax.Array:
    return jnp.ones(shape, dtype=jnp.float32)
