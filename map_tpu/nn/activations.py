"""Activation zoo.

Parity with the reference activation dispatcher (`code/layers.py:13-80`):
relu / tanh / sigmoid / none / elu / leu / gelu / gelu_new / swish / mish.
All are pure jnp functions so XLA fuses them into adjacent matmuls.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def leu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    # layers.py:13-27: alpha*log(x+1) for x>0 else alpha*(exp(x)-1)
    return jnp.where(x > 0, alpha * jnp.log1p(jnp.maximum(x, 0)),
                     alpha * jnp.expm1(jnp.minimum(x, 0)))


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    # layers.py:35-37 (exact erf formulation)
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    # layers.py:40-42 (tanh approximation)
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "none": lambda x: x,
    "elu": jax.nn.elu,
    "leu": leu,
    "gelu": gelu_erf,
    "gelu_new": gelu_new,
    "swish": swish,
    "mish": mish,
}


def get_act(act: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if callable(act):
        return act
    try:
        return _ACTS[act.lower()]
    except KeyError:
        raise NotImplementedError(f"activation {act!r}")
