"""DCNv2 cross-network op: X_{i+1} = X_i + X_0 * (X_i W_i + b_i).

Semantics: reference `code/layers.py:197-201`. Two implementations:
- XLA: a chain of dense matmuls with elementwise epilogues; XLA fuses the
  Hadamard+residual into the matmul consumer.
- Pallas (`map_tpu.ops.pallas_cross`): a single kernel that runs all L layers
  with the batch tile and X0 tile resident in VMEM, so each layer only streams
  the (D, D) weight from HBM once per batch tile — removing L-1 round trips of
  the (B, D) activations to HBM.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def cross_net_xla(x0: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                  biases: Sequence[jnp.ndarray]) -> jnp.ndarray:
    xi = x0
    for w, b in zip(kernels, biases):
        xi = xi + x0 * (jnp.dot(xi, w, preferred_element_type=xi.dtype) + b)
    return xi


def cross_net_apply(x0: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                    biases: Sequence[jnp.ndarray], use_pallas: bool = False) -> jnp.ndarray:
    if use_pallas and len(kernels) > 0:
        from map_tpu.ops.pallas_cross import cross_net_pallas

        return cross_net_pallas(x0, list(kernels), list(biases))
    return cross_net_xla(x0, kernels, biases)
