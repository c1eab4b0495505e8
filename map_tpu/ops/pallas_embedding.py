"""Pallas embedding gather: pipelined row DMAs from an HBM-resident table.

The embedding table stays in HBM (it can be GBs); ids arrive via scalar
prefetch so the kernel can compute DMA source addresses before the body runs
(PrefetchScalarGridSpec). Each grid step owns a tile of ids and keeps
NUM_INFLIGHT row copies in flight, hiding HBM latency behind the DMA queue —
the Pallas analogue of what cuDNN/ATen give the reference's nn.Embedding
forward for free (`code/layers.py:98`).

The backward pass stays on XLA's scatter-add (jnp.take's transpose), which is
already segment-sum shaped on TPU. `embedding_lookup(..., use_pallas=True)`
routes here; the op is wrapped in custom_vjp so autodiff works.

For small embed widths (the canonical E=16) a single row is a 64-byte
transfer, so this kernel mainly demonstrates/exercises the DMA path; the XLA
dynamic-gather is the default. `bench_lookup.py` compares both on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NUM_INFLIGHT = 8
TILE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    return _gather(table, ids, interpret)


def _fwd(table, ids, interpret):
    return _gather(table, ids, interpret), (table.shape[0], ids)


def _bwd(interpret, res, g):
    vocab_size, ids = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    dtable = jax.ops.segment_sum(flat_g, flat_ids, num_segments=vocab_size)
    return dtable, None


pallas_embedding_lookup.defvjp(_fwd, _bwd)


def _gather(table: jnp.ndarray, ids: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = ids.shape
    e = table.shape[1]
    flat = ids.reshape(-1)
    n = flat.shape[0]
    n_pad = _round_up(n, TILE)
    flat = jnp.pad(flat, (0, n_pad - n))

    def kernel(ids_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)
        base = i * TILE

        def make_dma(j):
            idx = ids_ref[base + j]
            return pltpu.make_async_copy(
                table_ref.at[idx], out_ref.at[j], sems.at[j % NUM_INFLIGHT])

        def start(j, _):
            make_dma(j).start()
            return 0

        def drain(j, _):
            make_dma(j).wait()
            return 0

        # Fill the pipeline, then steady-state: wait slot, reuse it.
        jax.lax.fori_loop(0, NUM_INFLIGHT, start, 0)

        def steady(j, _):
            make_dma(j - NUM_INFLIGHT).wait()
            make_dma(j).start()
            return 0

        jax.lax.fori_loop(NUM_INFLIGHT, TILE, steady, 0)
        jax.lax.fori_loop(TILE - NUM_INFLIGHT, TILE, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((TILE, e), lambda i, ids_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NUM_INFLIGHT,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, e), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(flat, table)
    return out[:n].reshape(*orig_shape, e)
