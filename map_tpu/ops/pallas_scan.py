"""Single-pass block cumsum (Pallas): streaming inclusive row-prefix-sum —
a sequential grid over 512-row blocks, each block scanned in VMEM
(Hillis-Steele shift-adds; the `cumsum` primitive has no Mosaic lowering)
and offset by a carry scratch that persists across grid steps.

STATUS: measured and NOT adopted for the MFP fold it was built for
(round 3): 5.08 ms standalone at 745k x 128 — no better than XLA's 5.5 ms
multi-pass cumsum (the sequential grid's per-step overhead plus the
log-scan's 9x add volume eat the single-pass bandwidth advantage) — and
73.4 ms in-step vs 43.7 (the pallas_call materialization barrier defeats
the fusion around the fold). Kept as a tested building block: on larger
row-blocks or fatter element types the trade-off can flip, and the
carry-across-grid pattern is the template for any streaming scan.
Oracle-pinned against jnp.cumsum in tests/test_pallas_scan.py."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK = 512
LANES = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("interpret",))
def block_cumsum(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum over axis 0 of an (n, w) f32 array.

    Routes through the Pallas streaming kernel on TPU when BLOCK divides n
    (n % 512 == 0) and w == LANES; otherwise falls back to jnp.cumsum (bit-comparable up to
    f32 reassociation: the kernel folds per 512-row block then adds the
    running carry — the same left-to-right order as a serial prefix sum at
    block granularity)."""
    n, w = x.shape
    if (not _on_tpu() and not interpret) or n % BLOCK or w != LANES:
        return jnp.cumsum(x, axis=0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _scan_block(x):
        # Hillis-Steele inclusive scan over the sublane axis (the `cumsum`
        # primitive has no Mosaic lowering): log2(BLOCK) shift-adds, all
        # in-register VPU work
        k = 1
        while k < x.shape[0]:
            pad = jnp.zeros((k, x.shape[1]), x.dtype)
            x = x + jnp.concatenate([pad, x[:-k]], axis=0)
            k *= 2
        return x

    def kernel(x_ref, o_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        cs = _scan_block(x_ref[...]) + carry_ref[...]
        o_ref[...] = cs
        carry_ref[...] = cs[-1:, :]

    return pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, w), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * w, bytes_accessed=2 * 4 * n * w,
            transcendentals=0),
        interpret=interpret,
    )(x)
