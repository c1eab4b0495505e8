"""Fused one-pass AdamW update for vocabulary tables (Pallas).

The parity-required decoupled weight decay (reference `code/trainer.py:61-72`
puts embedding tables in the decay group) forces a DENSE update of every
table row each step: param, mu, nu all read+written. optax.adamw lowers to
several XLA passes (measured 1.41 ms for the canonical packed 1M x 16 table
on v5e, vs ~0.55 ms of raw HBM traffic at 7 x 64 MB). This kernel performs
the entire update — bias-corrected Adam + decoupled weight decay, exactly
optax.adamw's algebra — in ONE tiled pass: each (512, W) tile of param / mu /
nu / grad streams HBM->VMEM once, the VPU computes the update, and the three
outputs stream back, with param/mu/nu aliased in-place.

Used by `map_tpu.train.optimizer.PartitionedTx`, which routes vocab-table
leaves here and everything else through optax. Numerics are pinned against
optax.adamw in tests/test_fused_adamw.py (bit-level tolerance).

Off-TPU (CPU tests) or for row counts not divisible by the tile, the same
algebra runs as a single fused XLA expression.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ROWS_PER_TILE = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _adamw_math(p, mu, nu, g, lr, wd, b1, b2, eps, bc1, bc2):
    """optax.adamw algebra: scale_by_adam (bias-corrected, eps_root=0) ->
    add_decayed_weights -> scale_by_learning_rate. bc1/bc2 = 1 - b^count_inc,
    precomputed OUTSIDE the kernel (Mosaic has no powf)."""
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * g * g
    mu_hat = mu / bc1
    nu_hat = nu / bc2
    upd = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p
    return p - lr * upd, mu, nu


@partial(jax.jit, static_argnames=("interpret", "force_xla"))
def fused_adamw_dense(p: jnp.ndarray, mu: jnp.ndarray, nu: jnp.ndarray,
                      g: jnp.ndarray, scalars: jnp.ndarray,
                      interpret: bool = False, force_xla: bool = False):
    """One-pass AdamW on a (R, W) table with a dense (R, W) gradient.

    scalars: (1, 8) f32 [lr, wd, b1, b2, eps, bc1, bc2, 0] — bc = 1 - b^t
    with t = the optax count AFTER increment (first update => t = 1).
    Returns (new_p, new_mu, new_nu).

    force_xla: run the same algebra as one fused XLA expression — used for
    ROW-SHARDED tables, where the elementwise XLA form shards for free while
    a pallas_call would force an all-gather of the table.
    """
    r, w = p.shape
    if force_xla or (not _on_tpu() and not interpret) \
            or r % ROWS_PER_TILE or w % 128:
        lr, wd, b1, b2, eps, bc1, bc2 = (scalars[0, i] for i in range(7))
        return _adamw_math(p, mu, nu, g, lr, wd, b1, b2, eps, bc1, bc2)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = ROWS_PER_TILE
    num_tiles = r // t

    def kernel(s_ref, p_ref, mu_ref, nu_ref, g_ref,
               po_ref, muo_ref, nuo_ref):
        lr, wd, b1, b2, eps, bc1, bc2 = (s_ref[0, i] for i in range(7))
        new_p, new_mu, new_nu = _adamw_math(
            p_ref[:], mu_ref[:], nu_ref[:], g_ref[:], lr, wd, b1, b2, eps,
            bc1, bc2)
        po_ref[:] = new_p
        muo_ref[:] = new_mu
        nuo_ref[:] = new_nu

    tile = lambda: pl.BlockSpec((t, w), lambda i: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            tile(), tile(), tile(), tile(),
        ],
        out_specs=[tile(), tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((r, w), jnp.float32)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        cost_estimate=pl.CostEstimate(
            flops=14 * r * w,
            bytes_accessed=4 * r * w * 7,
            transcendentals=2 * r * w,  # sqrt + pow in bias correction
        ),
        interpret=interpret,
    )(scalars, p, mu, nu, g)


def pack_scalars(lr, wd, b1, b2, eps, count_inc) -> jnp.ndarray:
    ci = jnp.asarray(count_inc, jnp.float32)
    bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** ci
    bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** ci
    vals = jnp.stack([jnp.asarray(x, jnp.float32) for x in
                      (lr, wd, b1, b2, eps, bc1, bc2, jnp.float32(0))])
    return vals.reshape(1, 8)
