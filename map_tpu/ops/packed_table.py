"""Lane-packed embedding table storage: (V, E) stored as (V/p, p*E), p=128//E.

XLA:TPU lays arrays out in (8, 128) tiles, so a table whose row width is
below 128 lanes is physically padded to 128 — a (1M, 16) f32 table occupies
8x its logical bytes in HBM. That padding is invisible to gathers (per-row
priced) but is paid IN FULL by every dense pass over the table, and the
parity-required decoupled weight decay (reference `code/trainer.py:61-72`
applies wd to embedding tables) forces a dense AdamW update of table + both
moments every step.

Packing p = 128 // E logical rows per physical 128-lane row removes the
padding: the dense update touches 1/p the HBM, and the gather fetches one
128-lane row (same per-row price) and selects the E-lane sub-block with a
one-hot contraction (VPU-friendly, no extra per-row-priced ops). The
backward pass is the exact transpose: the one-hot expand then a scatter-add
onto packed rows — same update-row count, 1/p the dense-layout traffic when
XLA fuses it into the optimizer pass.

This is a pure storage-layout change: every element sees bit-identical math
(init, lookup value, gradient, AdamW step), verified by tests/test_packed.py.
Rows V..Vp-1 are padding: never gathered, zero gradient, and their AdamW
trajectory is self-contained (they decay toward 0), so they never influence
real rows.

No reference counterpart (the reference's torch tables are dense-row-major
on GPU, `code/layers.py:86`); this is TPU-native layout engineering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_factor(embed_size: int) -> int:
    """Rows per 128-lane physical row (1 = packing is a no-op)."""
    if embed_size >= 128 or 128 % embed_size != 0:
        return 1
    return 128 // embed_size


ROW_ALIGN = 512  # fused-update tile (ops/fused_adamw.ROWS_PER_TILE)


def packed_rows(input_size: int, embed_size: int) -> int:
    """Physical rows: ceil(V/p), rounded up to ROW_ALIGN so every dense table
    pass tiles cleanly (the fused AdamW kernel requires it; padding rows are
    zero-init, never gathered, zero-grad — they only decay toward zero)."""
    p = pack_factor(embed_size)
    rows = -(-input_size // p)  # ceil
    if rows >= ROW_ALIGN:
        rows = -(-rows // ROW_ALIGN) * ROW_ALIGN
    return rows


def packed_shape(input_size: int, embed_size: int):
    p = pack_factor(embed_size)
    return (packed_rows(input_size, embed_size), p * embed_size)


def pack_table(table: jnp.ndarray, embed_size: int | None = None):
    """(V, E) -> (ceil(V/p), p*E), zero-padding the tail rows."""
    v, e = table.shape
    p = pack_factor(e)
    vp = packed_rows(v, e) * p
    if vp != v:
        pad = jnp.zeros((vp - v, e), table.dtype)
        table = jnp.concatenate([table, pad], axis=0)
    return table.reshape(vp // p, p * e)


def unpack_table(packed: jnp.ndarray, input_size: int, embed_size: int):
    p = pack_factor(embed_size)
    return packed.reshape(-1, embed_size)[:input_size]


def packed_lookup(packed: jnp.ndarray, ids: jnp.ndarray, embed_size: int,
                  use_pallas: bool = False,
                  field_bounds=None, hybrid_mode: str | None = None,
                  nresv: int = 10) -> jnp.ndarray:
    """Gather logical rows from a packed table: (..., ) ids -> (..., E).

    Routes the physical-row gather through ops.embedding.embedding_lookup so
    the model-axis shard_map exchange (row-sharded packed tables) and the
    Pallas DMA path apply unchanged.

    The sub-block selection is a p-way masked select-sum over LANE SLICES of
    the gathered 128-lane rows — not a one-hot einsum. Profiling showed the
    einsum form forced layout-changing reshapes to (B, F, p, E) costing
    ~2 ms/step at the canonical config; the select-sum is pure elementwise
    VPU work on the gather's native layout and fuses into its consumer.

    field_bounds: optional static tuple of per-field (lo, hi) logical id
    ranges, valid only when ids is (B, F). Routes small-vocab fields through
    the field-blocked hybrid path (ops/hybrid_gather.py) — resident-block
    gathers forward, block scatters backward — and big ID fields through the
    flat gather. Ignored when a table mesh is active (the shard_map exchange
    owns the physical gather then).
    """
    from map_tpu.ops.embedding import embedding_lookup

    p = 128 // embed_size if (embed_size < 128 and 128 % embed_size == 0) else 1
    if packed.shape[1] == embed_size:  # unpacked table: plain path
        return embedding_lookup(packed, ids, use_pallas=use_pallas)
    if field_bounds is not None and not use_pallas and ids.ndim == 2 \
            and len(field_bounds) == ids.shape[1]:
        from map_tpu.parallel.context import table_mesh

        if table_mesh() is None:
            from map_tpu.ops.hybrid_gather import hybrid_rows_gather

            rows = hybrid_rows_gather(packed, ids, tuple(field_bounds), p,
                                      nresv, hybrid_mode)
            return select_sub_block(rows, ids % p, embed_size)
    rows = embedding_lookup(packed, ids // p, use_pallas=use_pallas)
    return select_sub_block(rows, ids % p, embed_size)


def select_sub_block(rows_wide: jnp.ndarray, slot: jnp.ndarray,
                     embed_size: int) -> jnp.ndarray:
    """(..., p*E) wide rows + (...,) slot -> (..., E): lane-slice masked
    select-sum (used by packed_lookup and the dedup decoder path).

    The optimization barrier is load-bearing: without it XLA fuses each lane
    slice INTO the producing gather, turning one 128-lane row gather into p
    narrow per-row-priced gathers (measured 17.98 vs 5.5 ms/step at the
    canonical config). With the barrier the rows materialize once and the
    select-sum is pure VPU work; the barrier's VJP barriers the cotangent,
    which prevents the mirrored defusion in the backward pass."""
    rows_wide = jax.lax.optimization_barrier(rows_wide)
    p = rows_wide.shape[-1] // embed_size
    if embed_size == 1:
        # 1-wide tables (bias / LR weight) pack at p=128: the unrolled
        # masked-select chain below becomes 128 where+add terms whose VJP is
        # a 128-term cotangent chain — measured ~14x the emb path's backward
        # at the NCE target scale. A lane one-hot multiply+reduce is one VPU
        # pass and its VJP is a single outer product.
        onehot = jax.nn.one_hot(slot, p, dtype=rows_wide.dtype)
        return jnp.sum(rows_wide * onehot, axis=-1, keepdims=True)
    s2 = slot[..., None]
    out = None
    for s in range(p):
        term = jnp.where(s2 == s,
                         rows_wide[..., s * embed_size:(s + 1) * embed_size],
                         0.0)
        out = term if out is None else out + term
    return out


def expand_to_packed(vals: jnp.ndarray, sub_slot: jnp.ndarray,
                     pack: int) -> jnp.ndarray:
    """(C, E) row-values + (C,) sub-slot -> (C, pack*E) rows that scatter-add
    into a packed table at physical row id//pack (the transpose of the
    packed_lookup selection). Lane-slice masked writes, not a one-hot outer
    product (see packed_lookup)."""
    if vals.shape[1] == 1:
        # 1-wide values at p=128: one one-hot outer product instead of a
        # 128-term masked-write concat (same pathology as select_sub_block's
        # unrolled chain — see that function's embed_size==1 case)
        return jax.nn.one_hot(sub_slot, pack, dtype=vals.dtype) * vals
    slot = sub_slot[:, None]
    return jnp.concatenate(
        [jnp.where(slot == s, vals, 0.0) for s in range(pack)], axis=1)
