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


def scatter_unique_sorted(uids: jnp.ndarray, vals: jnp.ndarray,
                          vocab_size: int, interpret: bool = False,
                          rows_per_tile: int = 0,
                          matmul: str = "highest") -> jnp.ndarray:
    """Dense (V, E) gradient from a SORTED, DUPLICATE-FREE update stream.

    uids (C,) int32 ascending with sentinels >= vocab_size padding the tail;
    vals (C, E) f32. This is the scatter stage of the dedup pipeline
    (ops/dedup_scatter.py): after duplicate folding, each 512-row table tile
    receives at most 512 updates and they are CONTIGUOUS in the stream, so the
    kernel runs ONE grid step per output tile — the output is written exactly
    once (no revisiting, unlike the (chunk,tile) pair grid above) and the two
    aligned 512-entry superblocks covering the tile's window are selected by
    scalar-prefetch index maps. Per tile the update is two (512x512)@(512xE)
    one-hot MXU matmuls, turning XLA's ~140 ns/row serialized scatter into
    dense compute.

    `matmul`: 'highest' = exact f32 one-hot matmuls; 'bf16x2' = split each
    value into bf16 hi+lo halves and run two fast-pass matmuls (error ~2^-16
    relative — far below gradient noise, ~3x fewer MXU passes).

    Reference counterpart: torch's native scatter-add in nn.Embedding backward
    (`code/nce/index_linear.py:99-106`).
    """
    r = rows_per_tile or ROWS_PER_TILE
    c, e = vals.shape
    if (not _on_tpu() and not interpret) or c % r \
            or c < 2 * r or vocab_size < r:
        safe = jnp.where(uids < vocab_size, uids, vocab_size)
        return jax.ops.segment_sum(vals, safe, num_segments=vocab_size + 1,
                                   indices_are_sorted=True)[:vocab_size]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    v_pad = _round_up(vocab_size, r)
    num_tiles = v_pad // r
    nblk = c // r
    # sentinels sort to the tail; remap to v_pad so they land outside every
    # tile's [lo, lo+r) range (vocab_size itself may fall inside the last tile)
    uids = jnp.where(uids < vocab_size, uids, v_pad).astype(jnp.int32)

    # window start of each tile; ids unique => window length <= r, so the two
    # aligned r-blocks at [blk0, blk0+r), [blk0+r, blk0+2r) always cover it
    tile_lo = jnp.arange(num_tiles, dtype=jnp.int32) * r
    start = jnp.searchsorted(uids, tile_lo).astype(jnp.int32)
    blk0 = jnp.clip(start // r, 0, nblk - 2)
    blk1 = blk0 + 1

    ids3d = uids.reshape(nblk, 1, r)
    vals3d = vals.reshape(nblk, r, e)

    def kernel(b0_ref, b1_ref, ids0, ids1, v0, v1, out_ref):
        p = pl.program_id(0)
        lo = p * r

        def contrib(idx, v):
            inside = (idx >= lo) & (idx < lo + r)
            local = jnp.where(inside, idx - lo, -1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
            if matmul == "bf16x2":
                # one-hot is exact in bf16; split v into hi+lo bf16 halves so
                # two fast-pass matmuls reconstruct ~f32 (error ~2^-16 rel)
                onehot = (rows == local[None, :]).astype(jnp.bfloat16)
                v_hi = v.astype(jnp.bfloat16)
                v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                return (jnp.dot(onehot, v_hi,
                                preferred_element_type=jnp.float32) +
                        jnp.dot(onehot, v_lo,
                                preferred_element_type=jnp.float32))
            onehot = (rows == local[None, :]).astype(jnp.float32)
            return jnp.dot(onehot, v,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        out_ref[:] = (contrib(ids0[0, 0, :], v0[0]) +
                      contrib(ids1[0, 0, :], v1[0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # blk0, blk1
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, r), lambda p, b0, b1: (b0[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda p, b0, b1: (b1[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, e), lambda p, b0, b1: (b0[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, e), lambda p, b0, b1: (b1[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, e), lambda p, b0, b1: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, e), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 2 * r * r * e,
            bytes_accessed=4 * (2 * c * (e + 1) + v_pad * e),
            transcendentals=0,
        ),
        interpret=interpret,
    )(blk0, blk1, ids3d, ids3d, vals3d, vals3d)
    return out[:vocab_size]


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
