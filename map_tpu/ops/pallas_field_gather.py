"""Pallas field-block embedding kernels: ALL small fields in ONE op per
direction.

The multi-op XLA form of the field-blocked hybrid path (one sliced
gather/scatter per small field, ops/hybrid_gather.py) loses in-step despite
winning standalone: ~20 extra ops per direction break XLA's fusion/overlap
and serialize on the dense gradient buffer. These kernels collapse each
direction into a single pallas_call over a static (field, tile) pair list:

- The table's 512-row tiles overlapped by any small field's physical window
  are listed STATICALLY (field bounds are compile-time constants) and
  gathered into a compact (U, 512, W) tile stack by static slices.
- forward: grid over pairs; each pair contributes
      out[:, field] += onehot(B, 512) @ tile(512, W)
  with the one-hot built in-kernel from the field's physical ids (VPU
  compare, no HBM one-hot materialization). The output (B, Fs*W) block for a
  field stays resident in VMEM across its consecutive pairs (revisiting).
  Values are split hi/lo/lo2 into three bf16 matmuls — exact for f32 inputs
  (24-bit mantissa = 3 x 8-bit bf16 mantissas, one-hot rows have a single
  nonzero so accumulation is rounding-free): the gather is BIT-EXACT.
- backward: pairs ordered by tile; each pair contributes
      dtile[u] += onehot.T(512, B) @ g[:, field](B, W)
  revisiting per unique tile. The compact tile stack then assembles into the
  dense (R, W) gradient by ONE concatenation (tiles are 512-aligned and
  disjoint by construction — no boundary folds, no update chains), and the
  big-field rows scatter on top in place.

MXU cost: ~3 x 0.5 GFLOP per pair (a few tens of pairs at CTR geometries) —
microseconds; HBM cost: one read of the touched tiles + one (B, Fs*W)
stream. Off-TPU the XLA fallback in ops/hybrid_gather.py applies; interpret
mode covers these kernels in tests.

Reference counterpart: none (torch nn.Embedding has no notion of field
blocks); TPU-native layout engineering on the dataset's id-space invariant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TILE = 512


def plan_pairs(small, r: int):
    """Static plan. small: tuple of (field_pos, plo, pe) with field_pos the
    position in the SMALL-FIELD ORDER (0..Fs-1), [plo, pe) the physical-row
    window. Returns (utiles, pairs): utiles = sorted unique 512-aligned tile
    indices; pairs = tuple of (small_pos, utile_slot, tile_row0)."""
    utiles = sorted({t for _, plo, pe in small
                     for t in range(plo // TILE, (pe - 1) // TILE + 1)})
    slot = {t: i for i, t in enumerate(utiles)}
    pairs = []
    for pos, plo, pe in small:
        for t in range(plo // TILE, (pe - 1) // TILE + 1):
            pairs.append((pos, slot[t], t * TILE))
    assert all(t * TILE + TILE <= r for t in utiles), (utiles[-1], r)
    return tuple(utiles), tuple(pairs)


def _split3(v):
    """f32 -> (hi, lo, lo2) bf16 triplet with hi+lo+lo2 == v exactly."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    lo = r1.astype(jnp.bfloat16)
    lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo, lo2


def _mm3(onehot_bf16, vals_f32):
    """onehot (M, K) bf16 @ vals (K, W) f32 via three exact bf16 passes."""
    acc = None
    for part in _split3(vals_f32):
        term = jnp.dot(onehot_bf16, part, preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


@partial(jax.jit, static_argnames=("small", "r", "interpret"))
def field_block_gather(packed: jnp.ndarray, phys_small: jnp.ndarray,
                       small, r: int, interpret: bool = False) -> jnp.ndarray:
    """packed (R, W) f32; phys_small (Fs, B) int32 physical row ids (already
    masked: out-of-block positions hold -1); small: static ((pos, plo, pe),
    ...). Returns (B, Fs*W) — field pos's wide rows at lanes [pos*W, ...).
    Bit-exact vs jnp.take for in-window ids; -1 rows produce zeros."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs, b = phys_small.shape
    w = packed.shape[1]
    utiles, pairs = plan_pairs(small, r)
    tiles3d = packed.reshape(r // TILE, TILE, w)
    u_idx = jnp.asarray(utiles, jnp.int32)
    stack = jnp.take(tiles3d, u_idx, axis=0)        # (U, TILE, W) static rows

    pair_pos = jnp.asarray([p[0] for p in pairs], jnp.int32)
    pair_slot = jnp.asarray([p[1] for p in pairs], jnp.int32)
    pair_row0 = jnp.asarray([p[2] for p in pairs], jnp.int32)
    # first pair of each field position (pairs are field-ordered)
    firsts, seen = [], set()
    for p, _, _ in pairs:
        firsts.append(1 if p not in seen else 0)
        seen.add(p)
    pair_first = jnp.asarray(firsts, jnp.int32)

    def kernel(pos_ref, slot_ref, row0_ref, first_ref, ids_ref, tile_ref,
               out_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        local = ids_ref[0, 0, :] - row0_ref[i]         # (B,)
        inside = (local >= 0) & (local < TILE) & (ids_ref[0, 0, :] >= 0)
        lcl = jnp.where(inside, local, -1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b, TILE), 1)
        onehot = (cols == lcl[:, None]).astype(jnp.bfloat16)
        out_ref[:] += _mm3(onehot, tile_ref[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda i, po, sl, r0, fi: (po[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, w), lambda i, po, sl, r0, fi: (sl[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, w), lambda i, po, sl, r0, fi: (0, po[i]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, fs * w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * len(pairs) * b * TILE * w,
            bytes_accessed=4 * (len(utiles) * TILE * w + b * fs * (w + 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pair_pos, pair_slot, pair_row0, pair_first,
      phys_small.reshape(fs, 1, b), stack)


@partial(jax.jit, static_argnames=("small", "r", "interpret"))
def field_block_scatter(g_small: jnp.ndarray, phys_small: jnp.ndarray,
                        small, r: int, interpret: bool = False):
    """Transpose of field_block_gather: g_small (B, Fs*W) wide cotangents,
    phys_small (Fs, B) physical ids (-1 = skip). Returns the compact
    (U, TILE, W) f32 summed tile gradients; the matching (static) tile list
    is plan_pairs(small, r)[0] — assemble with assemble_dense."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs, b = phys_small.shape
    w = g_small.shape[1] // fs
    utiles, pairs = plan_pairs(small, r)
    # order pairs by tile so revisiting accumulates per unique tile
    order = sorted(range(len(pairs)), key=lambda i: (pairs[i][1], pairs[i][0]))
    pairs_t = [pairs[i] for i in order]
    pair_pos = jnp.asarray([p[0] for p in pairs_t], jnp.int32)
    pair_slot = jnp.asarray([p[1] for p in pairs_t], jnp.int32)
    pair_row0 = jnp.asarray([p[2] for p in pairs_t], jnp.int32)
    firsts, seen = [], set()
    for _, s, _ in pairs_t:
        firsts.append(1 if s not in seen else 0)
        seen.add(s)
    pair_first = jnp.asarray(firsts, jnp.int32)

    def kernel(pos_ref, slot_ref, row0_ref, first_ref, ids_ref, g_ref,
               out_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        local = ids_ref[0, 0, :] - row0_ref[i]
        inside = (local >= 0) & (local < TILE) & (ids_ref[0, 0, :] >= 0)
        lcl = jnp.where(inside, local, -1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, b), 0)
        onehot_t = (rows == lcl[None, :]).astype(jnp.bfloat16)  # (TILE, B)
        out_ref[0] += _mm3(onehot_t, g_ref[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(len(pairs_t),),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda i, po, sl, r0, fi: (po[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, w), lambda i, po, sl, r0, fi: (po[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, w),
                               lambda i, po, sl, r0, fi: (sl[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    stack = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((len(utiles), TILE, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * len(pairs_t) * b * TILE * w,
            bytes_accessed=4 * (len(utiles) * TILE * w + b * fs * (w + 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pair_pos, pair_slot, pair_row0, pair_first,
      phys_small.reshape(fs, 1, b), _to_fbw(g_small, fs, b, w))
    return stack


def _to_fbw(g_small, fs, b, w):
    """(B, Fs*W) -> (Fs, B, W) without a layout-hostile transpose: the lane
    split is a reshape, the (B, Fs) swap is one transpose XLA handles as a
    tiled copy."""
    return jnp.transpose(g_small.reshape(b, fs, w), (1, 0, 2))


def assemble_dense(stack: jnp.ndarray, utiles, r: int) -> jnp.ndarray:
    """Compact (U, TILE, W) tile gradients -> dense (R, W) by ONE
    concatenation (tiles are 512-aligned and disjoint)."""
    w = stack.shape[2]
    parts, cursor = [], 0
    for i, t in enumerate(utiles):
        row0 = t * TILE
        if row0 > cursor:
            parts.append(jnp.zeros((row0 - cursor, w), jnp.float32))
        parts.append(stack[i])
        cursor = row0 + TILE
    if cursor < r:
        parts.append(jnp.zeros((r - cursor, w), jnp.float32))
    return jnp.concatenate(parts, axis=0)
