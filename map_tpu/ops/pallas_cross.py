"""Fused Pallas kernel for the DCNv2 cross network.

Semantics: X_{l+1} = X_l + X_0 * (X_l W_l + b_l) for l = 0..L-1 (reference
`code/layers.py:197-201`). The XLA path materializes each layer's (B, D)
activation in HBM between layers; this kernel keeps the batch tile of X_0 and
X_i resident in VMEM across all L layers, so per batch tile only the stacked
(L, D, D) weights stream from HBM once and the MXU runs back-to-back D x D
matmuls with the Hadamard+residual epilogue fused on the VPU.

Backward: custom VJP with per-layer inputs X_l and pre-gate products U_l saved
as kernel outputs; the gradient chain
    dU_l = g * X_0;  dW_l = X_l^T dU_l;  db_l = sum dU_l;
    g   <- g + dU_l W_l^T;  dX_0 += g_{l+1} * U_l
is GEMM-dominated and left to XLA (it hits the MXU directly).

Falls back to the XLA path off-TPU or for shapes too small to tile.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu.ops.cross import cross_net_xla


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def cross_net_pallas(x0: jnp.ndarray, kernels: List[jnp.ndarray],
                     biases: List[jnp.ndarray],
                     interpret: bool = False) -> jnp.ndarray:
    d = x0.shape[-1]
    # d must be a 128-lane multiple: Mosaic rejects ragged tiles for this
    # kernel's (D, D) blocks (observed as a remote-compile crash at
    # D = 39 fields x 16 = 624, Criteo geometry). The kernel is
    # perf-neutral vs XLA at the canonical size anyway (PERFORMANCE.md
    # round-1 finding 2), so the fallback costs nothing.
    if (not _on_tpu() and not interpret) or d < 128 or d % 128 \
            or x0.shape[0] < 8:
        return cross_net_xla(x0, kernels, biases)
    global _INTERPRET
    _INTERPRET = interpret
    w = jnp.stack(kernels)  # (L, D, D)
    b = jnp.stack(biases)   # (L, D)
    return _cross_fused(x0, w, b)


_INTERPRET = False


@jax.custom_vjp
def _cross_fused(x0, w, b):
    y, _, _ = _cross_forward(x0, w, b)
    return y


def _cross_fused_fwd(x0, w, b):
    y, xs, us = _cross_forward(x0, w, b)
    return y, (x0, w, xs, us)


def _cross_fused_bwd(res, g):
    x0, w, xs, us = res
    num_layers = w.shape[0]
    dx0_gate = jnp.zeros_like(x0)
    dw = [None] * num_layers
    db = [None] * num_layers
    for layer in reversed(range(num_layers)):
        du = g * x0
        dw[layer] = jnp.einsum("bi,bo->io", xs[layer], du,
                               preferred_element_type=jnp.float32)
        db[layer] = du.sum(axis=0)
        dx0_gate = dx0_gate + g * us[layer]
        g = (g + jnp.dot(du, w[layer].T,
                         preferred_element_type=jnp.float32)).astype(g.dtype)
    # cotangents must match primal dtypes (bf16 compute => bf16 grads here;
    # the optimizer accumulates in f32 upstream)
    return ((g + dx0_gate).astype(x0.dtype),
            jnp.stack(dw).astype(w.dtype), jnp.stack(db).astype(w.dtype))


_cross_fused.defvjp(_cross_fused_fwd, _cross_fused_bwd)


def _cross_forward(x0: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, d = x0.shape
    num_layers = w.shape[0]
    d_pad = _round_up(d, 128)
    tile_b = min(512, _round_up(batch, 8))
    b_pad = _round_up(batch, tile_b)

    x0p = jnp.pad(x0, ((0, b_pad - batch), (0, d_pad - d)))
    wp = jnp.pad(w, ((0, 0), (0, d_pad - d), (0, d_pad - d)))
    bp = jnp.pad(b, ((0, 0), (0, d_pad - d)))

    dt = x0.dtype  # bf16 compute stores bf16 tiles; MXU accumulates f32

    def kernel(x0_ref, w_ref, b_ref, y_ref, xs_ref, us_ref):
        x0_tile = x0_ref[:]
        xi = x0_tile
        for layer in range(num_layers):  # static unroll
            xs_ref[layer] = xi
            u = (jnp.dot(xi, w_ref[layer], preferred_element_type=jnp.float32)
                 + b_ref[layer][None, :].astype(jnp.float32)).astype(dt)
            us_ref[layer] = u
            xi = xi + x0_tile * u
        y_ref[:] = xi

    grid = (b_pad // tile_b,)
    y, xs, us = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, d_pad, d_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, tile_b, d_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, tile_b, d_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d_pad), dt),
            jax.ShapeDtypeStruct((num_layers, b_pad, d_pad), dt),
            jax.ShapeDtypeStruct((num_layers, b_pad, d_pad), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_layers * b_pad * d_pad * d_pad,
            bytes_accessed=4 * (b_pad * d_pad * (2 + 2 * num_layers)
                                + num_layers * d_pad * d_pad),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x0p, wp, bp)
    return y[:batch, :d], xs[:, :batch, :d], us[:, :batch, :d]
