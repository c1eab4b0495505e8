"""Pallas embedding scatter-add: the gradient kernel for table updates.

XLA's scatter-add serializes the row updates (~68 ns each measured on v5e:
6.7 ms for the supervised 98k-row batch, >100 ms for the MFP candidate set of
B*M*(1+k) ~ 745k rows), making it the dominant cost of embedding training.
This kernel reformulates scatter-add as dense compute:

1. sort the flat ids (XLA sort) and permute the row-gradients the same way,
   so each output tile of the table owns a CONTIGUOUS range of updates;
2. build a (chunk, tile) PAIR LIST on host: every 128-update chunk is paired
   with each table tile it overlaps (sorted ids ⇒ tiles are non-decreasing,
   so pairs for one tile are consecutive; empty tiles get one no-op pair);
3. grid over pairs with scalar-prefetch-driven BlockSpec index maps: the ids
   chunk and gradient chunk stream through the normal Pallas pipeline, the
   output tile stays resident in VMEM across its consecutive pairs
   (revisiting), and each pair accumulates
       out += one_hot(local_ids_chunk) @ grad_chunk
   — the compare runs on the VPU, the accumulation is an (R x C) @ (C x E)
   MXU matmul (exact f32), and duplicate ids fold in for free.

Total work is one stream over the sorted gradients plus one write of the
table — bandwidth-bound instead of latency-bound, with O(1) VMEM.

Used by the NCE decoder's candidate gathers unconditionally (the MFP
enabler) and available as the custom-VJP backward of
map_tpu.ops.embedding.gather_rows. Falls back to jax.ops.segment_sum off-TPU.
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
    n_chunks = n_pad // CHUNK

    order = jnp.argsort(ids)
    # pad with a sentinel beyond every tile so padded lanes never match
    ids_sorted = jnp.pad(ids[order], (0, n_pad - n), constant_values=v_pad)
    g_sorted = jnp.pad(g[order], ((0, n_pad - n), (0, 0)))
    # (n_chunks, 1, CHUNK): block (1, 1, CHUNK) satisfies the TPU tiling rule
    # (sublane dim equals the full array dim).
    ids3d = ids_sorted.reshape(n_chunks, 1, CHUNK)

    # ---- host-side (XLA) pair-list construction -------------------------
    tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * ROWS_PER_TILE
    starts = jnp.searchsorted(ids_sorted[:n], tile_bounds).astype(jnp.int32)
    first_chunk = starts[:-1] // CHUNK
    end_chunk = -(-starts[1:] // CHUNK)  # cdiv
    cpt = jnp.maximum(end_chunk - first_chunk, 1)  # >=1: empty tiles zero out
    num_pairs = n_chunks + num_tiles  # static upper bound
    pair_tile = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), cpt,
                           total_repeat_length=num_pairs)
    offsets = jnp.cumsum(cpt) - cpt
    pidx = jnp.arange(num_pairs, dtype=jnp.int32)
    intra = pidx - jnp.take(offsets, pair_tile).astype(jnp.int32)
    pair_chunk = jnp.clip(jnp.take(first_chunk, pair_tile) + intra,
                          0, n_chunks - 1).astype(jnp.int32)
    pair_first = (intra == 0).astype(jnp.int32)
    pair_valid = (pidx < jnp.sum(cpt)).astype(jnp.int32)

    def kernel(tile_ref, chunk_ref, first_ref, valid_ref,
               ids_ref, g_ref, out_ref):
        p = pl.program_id(0)
        lo = tile_ref[p] * ROWS_PER_TILE

        @pl.when(first_ref[p] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(valid_ref[p] == 1)
        def _():
            idx = ids_ref[0, 0, :]
            inside = (idx >= lo) & (idx < lo + ROWS_PER_TILE)
            local = jnp.where(inside, idx - lo, -1)
            rows = jax.lax.broadcasted_iota(jnp.int32,
                                            (ROWS_PER_TILE, CHUNK), 0)
            onehot = (rows == local[None, :]).astype(jnp.float32)
            # exact f32: this is a gradient, keep full precision
            out_ref[:] += jnp.dot(onehot, g_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # pair_tile, pair_chunk, pair_first, pair_valid
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda p, t, c, f, v: (c[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, e), lambda p, t, c, f, v: (c[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_TILE, e),
                               lambda p, t, c, f, v: (t[p], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, e), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * CHUNK * ROWS_PER_TILE * e,
            bytes_accessed=4 * (n_pad * (e + 1) + v_pad * e),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pair_tile, pair_chunk, pair_first, pair_valid, ids3d, g_sorted)
    return out[:vocab_size]
