"""Field-blocked hybrid embedding access: small-vocab fields ride small
resident blocks, big ID fields keep the flat gather/scatter.

The dataset id space is field-blocked (map_tpu/data/dataset.py: every field
owns a contiguous id range [idx_low[f], idx_high[f]), ids 0..9 reserved —
same invariant as the reference's feat_map construction,
`/root/reference/code/dataset.py` + `data_preprocess/*`). In Avazu/Criteo the
VOCABULARY mass sits in a few huge ID fields (device_ip, device_id, ...) but
most FIELDS are small (tens..thousands of ids). A dynamic gather/scatter
against the whole packed table is per-row priced (~8-13 ns/row on v5e —
latency against a 60+ MB working set); the same row from a field block of a
few hundred KB is servable at near-resident speed.

`hybrid_rows_gather(packed, ids, bounds, pack, nresv)` returns the physical
128-lane rows for (B, F) logical ids, routing each field by its block size:

- big fields (> SMALL_FIELD_MAX ids): one flat `jnp.take` over the packed
  table; backward is one XLA scatter-add (only ~B * n_big rows).
- small fields: the field's physical block is STATICALLY sliced out of the
  table and the lookup is a local gather from that (resident) block;
  backward scatters into a block-sized buffer and slice-adds it into the
  dense gradient. Reserved ids [0, nresv) — padding rows, the MFP
  `<mask>`=3 — are handled by a separate tiny-table term; the backward
  reserved contribution is a masked SUM (resv_pe rows), not a scatter.

Correctness contract: every id in a small field's column must lie in
[lo_f, hi_f) ∪ [0, nresv). The dataset guarantees this for raw rows (in-block
assert, data/dataset.py) and MFP corruption only writes mask_id=3; RFD
whole-vocab generators violate it, so run.py disables the hybrid path for
those configs (config.field_blocked_lookup=False).

The whole lookup is one custom_vjp so the backward builds ONE dense (R, W)
gradient buffer with in-place block adds — without it, the VJP of each
`lax.slice` pads its cotangent to full table shape (F_small dense
materializations). Numerics are exact: gathers and scatter-adds in f32, no
matmul reformulation. Oracle-pinned in tests/test_hybrid_gather.py.

Reference counterpart: torch nn.Embedding forward/backward
(`code/layers.py:86`, ATen index_select/index_add) — which has no notion of
field blocks; this is TPU-native layout engineering on the same id-space
invariant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Fields with at most this many logical ids take the small-block path. At the
# canonical config (B=4096, W=128) the crossover between block-resident
# access and the flat per-row price sits well above this (measured,
# benchmarks/bench_hybrid_probe.py); beyond it the block slices stop fitting
# in fast memory and the flat path wins.
SMALL_FIELD_MAX = 16384


def field_groups(bounds, pack: int):
    """Split fields by block size. bounds: static tuple of (lo, hi) logical
    id ranges per field. Returns (small, big): small = tuple of
    (field, lo, hi, plo, pe) with [plo, pe) the physical-row window; big =
    tuple of field indices."""
    small, big = [], []
    for f, (lo, hi) in enumerate(bounds):
        if hi - lo <= SMALL_FIELD_MAX and hi > lo:
            plo = lo // pack
            pe = (hi - 1) // pack + 1
            small.append((f, lo, hi, plo, pe))
        else:
            big.append(f)
    return tuple(small), tuple(big)


def _resv_pe(nresv: int, pack: int) -> int:
    return max(1, -(-nresv // pack))


def _gather_wide(packed, ids, bounds, pack, nresv):
    """Forward: (R, W) packed table + (B, F) logical ids -> (B, F, W)."""
    b, f = ids.shape
    w = packed.shape[1]
    small, big = field_groups(bounds, pack)
    assert len(small) + len(big) == f
    phys = ids // pack
    parts = []
    order = []
    if big:
        big_idx = list(big)
        rows_big = jnp.take(packed, phys[:, big_idx].reshape(-1),
                            axis=0).reshape(b, len(big_idx), w)
        parts.append(rows_big)
        order.extend(big_idx)
    if small:
        rpe = _resv_pe(nresv, pack)
        resv_block = jax.lax.slice(packed, (0, 0), (rpe, w))
        outs = []
        for fi, lo, hi, plo, pe in small:
            idf = ids[:, fi]
            in_block = (idf >= lo) & (idf < hi)
            is_resv = idf < nresv
            local = jnp.clip(phys[:, fi] - plo, 0, pe - plo - 1)
            block = jax.lax.slice(packed, (plo, 0), (pe, w))
            r_blk = jnp.take(block, local, axis=0)
            r_res = jnp.take(resv_block,
                             jnp.clip(phys[:, fi], 0, rpe - 1), axis=0)
            outs.append(jnp.where(in_block[:, None], r_blk,
                                  jnp.where(is_resv[:, None], r_res, 0.0)))
        parts.append(jnp.stack(outs, axis=1))
        order.extend(fi for fi, *_ in small)
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if order == list(range(f)):
        return cat
    inv = [0] * f
    for pos, fi in enumerate(order):
        inv[fi] = pos
    return jnp.take(cat, jnp.asarray(inv, jnp.int32), axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def hybrid_rows_gather(packed: jnp.ndarray, ids: jnp.ndarray,
                       bounds, pack: int, nresv: int) -> jnp.ndarray:
    """Physical-row lookup (B, F) -> (B, F, W) with field-blocked routing.

    bounds/pack/nresv are static. See module docstring for the contract."""
    return _gather_wide(packed, ids, bounds, pack, nresv)


def _hg_fwd(packed, ids, bounds, pack, nresv):
    # packed[:, :0]: zero-byte witness carrying the row count and dtype
    return _gather_wide(packed, ids, bounds, pack, nresv), \
        (ids, packed[:, :0])


def _hg_bwd(bounds, pack, nresv, res, g):
    ids, witness = res
    r, dt = witness.shape[0], witness.dtype
    w = g.shape[-1]
    small, big = field_groups(bounds, pack)
    g = g.astype(jnp.float32)
    phys = ids // pack
    if big:
        big_idx = list(big)
        dense = jnp.zeros((r, w), jnp.float32).at[
            phys[:, big_idx].reshape(-1)].add(
            g[:, big_idx].reshape(-1, w))
    else:
        dense = jnp.zeros((r, w), jnp.float32)
    if small:
        rpe = _resv_pe(nresv, pack)
        resv_acc = jnp.zeros((rpe, w), jnp.float32)
        for fi, lo, hi, plo, pe in small:
            idf = ids[:, fi]
            in_block = (idf >= lo) & (idf < hi)
            is_resv = idf < nresv
            gf = g[:, fi]
            s = pe - plo
            # out-of-block -> slot s (dropped by the slice); values are also
            # masked because .at[] wraps negatives numpy-style before 'drop'
            local = jnp.where(in_block,
                              jnp.clip(phys[:, fi] - plo, 0, s - 1),
                              jnp.int32(s))
            bg = jnp.zeros((s + 1, w), jnp.float32).at[local].add(
                jnp.where(in_block[:, None], gf, 0.0))[:s]
            dense = jax.lax.dynamic_update_slice(
                dense,
                jax.lax.dynamic_slice(dense, (plo, 0), (s, w)) + bg,
                (plo, 0))
            # reserved ids: <= rpe destination rows -> masked sums, no scatter
            for j in range(rpe):
                hit = (is_resv & (phys[:, fi] == j))[:, None]
                resv_acc = resv_acc.at[j].add(
                    jnp.sum(jnp.where(hit, gf, 0.0), axis=0))
        dense = jax.lax.dynamic_update_slice(
            dense, jax.lax.dynamic_slice(dense, (0, 0), (rpe, w)) + resv_acc,
            (0, 0))
    return dense.astype(dt), None


hybrid_rows_gather.defvjp(_hg_fwd, _hg_bwd)
