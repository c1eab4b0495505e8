"""Parameter initializers matching the reference's (torch-default) statistics.

The reference relies on torch defaults for nn.Linear / nn.Conv2d
(kaiming_uniform(a=sqrt(5)), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias) and a custom normal for the embedding table
(`code/layers.py:87-91`: std = sqrt(2/(num_fields+embed_size))). Matching the
init distribution keeps training dynamics comparable so the reference's tuned
hyperparameters transfer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)); flax kernel shape = (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """flax Conv kernel shape = (*spatial, in_features, out_features)."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def embedding_init(num_fields: int, embed_size: int):
    """normal(std=sqrt(2/(num_fields+embed_size))), reference layers.py:87-91."""
    std = math.sqrt(2.0 / float(num_fields + embed_size))

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_init(key, shape, dtype=jnp.float32):
    """Matches torch.nn.init.xavier_normal_ for 2D+ tensors (fan over last two dims)."""
    fan_in, fan_out = shape[-1], shape[-2]
    std = math.sqrt(2.0 / float(fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-1], shape[-2]
    bound = math.sqrt(6.0 / float(fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_scale_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init
