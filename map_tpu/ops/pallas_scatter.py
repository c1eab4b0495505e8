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

    def kernel(starts_ref, ids_ref, g_ref, out_ref):
        t = pl.program_id(0)
        lo = t * ROWS_PER_TILE
        start = starts_ref[t]
        end = starts_ref[t + 1]
        # 128-aligned chunk window covering [start, end)
        c0 = start // CHUNK
        c1 = pl.cdiv(end, CHUNK)

        def body(i, acc):
            c = c0 + i
            idx = ids_ref[c, :]  # (CHUNK,) aligned read, dynamic sublane index
            inside = (idx >= lo) & (idx < lo + ROWS_PER_TILE)
            local = jnp.where(inside, idx - lo, -1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_TILE, CHUNK), 0)
            onehot = (rows == local[None, :]).astype(jnp.float32)
            gc = g_ref[pl.ds(c * CHUNK, CHUNK), :]
            # exact f32 accumulation: this is a gradient, keep full precision
            return acc + jnp.dot(onehot, gc, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        acc0 = jnp.zeros((ROWS_PER_TILE, e), jnp.float32)
        num_chunks = jnp.maximum(c1 - c0, 0)
        out_ref[:] = jax.lax.fori_loop(0, num_chunks, body, acc0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            # whole sorted streams resident in VMEM across the grid
            pl.BlockSpec(ids2d.shape, lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g_sorted.shape, lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_TILE, e), lambda t, s: (t, 0),
                               memory_space=pltpu.VMEM),
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
