"""Pallas embedding scatter-add: the gradient kernel for table updates.

XLA's scatter-add serializes the B*F row updates (~68 ns each measured on
v5e — 6.7 ms for the canonical batch), making it the single largest cost in
the DCNv2 train step. This kernel reformulates scatter-add as dense compute:

1. sort the flat ids (XLA sort, fast) and permute the row-gradients the same
   way, so each output tile of the table owns a CONTIGUOUS range of updates;
2. precompute each tile's [start, end) update range with searchsorted
   (scalar-prefetched to SMEM);
3. per table tile (grid dimension), sweep the 128-aligned update chunks that
   overlap the range and accumulate
       acc += one_hot(local_ids_chunk) @ grad_chunk
   in VMEM: the one-hot compare runs on the VPU, the accumulation is an
   (R x C) @ (C x E) MXU matmul, duplicates fold in for free, and chunks
   straddling a tile boundary are masked (each tile keeps only its rows).

Total work is one stream over the sorted gradients plus one write of the
table — bandwidth-bound instead of latency-bound.

Used as the backward of `map_tpu.ops.embedding.embedding_lookup` and directly
by tests. Falls back to jax.ops.segment_sum off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ROWS_PER_TILE = 512
CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def scatter_add(ids: jnp.ndarray, grads: jnp.ndarray, vocab_size: int,
                interpret: bool = False) -> jnp.ndarray:
    """ids (...,) int, grads (..., E) -> table gradient (vocab_size, E)."""
    flat_ids = ids.reshape(-1)
    flat_g = grads.reshape(-1, grads.shape[-1])
    if (not _on_tpu() and not interpret) or flat_ids.shape[0] < CHUNK \
            or vocab_size < ROWS_PER_TILE:
        return jax.ops.segment_sum(flat_g, flat_ids, num_segments=vocab_size)
    e = flat_g.shape[-1]
    if e < 8:  # lane-pad narrow tables (e.g. the NCE bias column, E=1)
        flat_g = jnp.pad(flat_g, ((0, 0), (0, 8 - e)))
        return _scatter_add_pallas(flat_ids, flat_g, vocab_size, interpret)[:, :e]
    return _scatter_add_pallas(flat_ids, flat_g, vocab_size, interpret)


def _scatter_add_pallas(ids: jnp.ndarray, g: jnp.ndarray, vocab_size: int,
                        interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, e = g.shape
    v_pad = _round_up(vocab_size, ROWS_PER_TILE)
    num_tiles = v_pad // ROWS_PER_TILE
    n_pad = _round_up(n, CHUNK)

    order = jnp.argsort(ids)
    # pad with a sentinel beyond every tile so padded lanes never match
    ids_sorted = jnp.pad(ids[order], (0, n_pad - n), constant_values=v_pad)
    g_sorted = jnp.pad(g[order], ((0, n_pad - n), (0, 0)))
    ids2d = ids_sorted.reshape(n_pad // CHUNK, CHUNK)

    tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * ROWS_PER_TILE
    starts = jnp.searchsorted(ids_sorted[:n], tile_bounds).astype(jnp.int32)

    def kernel(starts_ref, ids_hbm, g_hbm, out_ref, ids_buf, g_buf, sems):
        # The sorted update stream stays in HBM (it can be hundreds of MB for
        # the MFP candidate set); each tile streams its 128-update chunks
        # through a double-buffered VMEM scratch.
        t = pl.program_id(0)
        lo = t * ROWS_PER_TILE
        start = starts_ref[t]
        end = starts_ref[t + 1]
        c0 = start // CHUNK  # 128-aligned window covering [start, end)
        c1 = pl.cdiv(end, CHUNK)
        num_chunks = jnp.maximum(c1 - c0, 0)

        def dma_ids(slot, c):
            return pltpu.make_async_copy(ids_hbm.at[c], ids_buf.at[slot],
                                         sems.at[slot, 0])

        def dma_g(slot, c):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(c * CHUNK, CHUNK), :], g_buf.at[slot],
                sems.at[slot, 1])

        @pl.when(num_chunks > 0)
        def _():
            dma_ids(0, c0).start()
            dma_g(0, c0).start()

        def body(i, acc):
            slot = jax.lax.rem(i, 2)
            c = c0 + i

            @pl.when(i + 1 < num_chunks)
            def _():
                nxt = jax.lax.rem(i + 1, 2)
                dma_ids(nxt, c + 1).start()
                dma_g(nxt, c + 1).start()

            dma_ids(slot, c).wait()
            dma_g(slot, c).wait()
            idx = ids_buf[slot]
            inside = (idx >= lo) & (idx < lo + ROWS_PER_TILE)
            local = jnp.where(inside, idx - lo, -1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_TILE, CHUNK), 0)
            onehot = (rows == local[None, :]).astype(jnp.float32)
            # exact f32 accumulation: this is a gradient, keep full precision
            return acc + jnp.dot(onehot, g_buf[slot],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        acc0 = jnp.zeros((ROWS_PER_TILE, e), jnp.float32)
        out_ref[:] = jax.lax.fori_loop(0, num_chunks, body, acc0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # ids2d stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # g_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec((ROWS_PER_TILE, e), lambda t, s: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK), jnp.int32),
            pltpu.VMEM((2, CHUNK, e), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, e), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * ROWS_PER_TILE * e,
            bytes_accessed=4 * (n_pad * (e + 1) + v_pad * e),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts, ids2d, g_sorted)
    return out[:vocab_size]
