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
# in fast memory and the flat path wins. Held at 16384 on BOTH bench
# geometries (Avazu-like 24-field and Criteo-like 39-field mixes — the
# round-3 sweep in PERFORMANCE.md); the env override exists for re-sweeping
# on new hardware or geometries.
import os as _os

SMALL_FIELD_MAX = int(_os.environ.get("MAP_TPU_SMALL_FIELD_MAX", "16384"))

# Backward-mode selection. Measured on v5e at the canonical config (bench.py,
# 2026-08-21, round 2 unless noted):
#   flat both directions             3.99 ms/step
#   hybrid fwd + flat bwd ("fwd")    3.19 ms/step   <- default
#                                    (round-3 re-measure with 3x300-step
#                                    median windows: 3.04 ms, 1.348M ex/s)
#   hybrid fwd + matmul bwd          3.12 ms (round 3): small-field
#                                    gradients as per-field one-hot MXU
#                                    matmuls + big-field-only flat scatter.
#                                    LOSES ~0.08 ms to "fwd" — the HIGHEST-
#                                    precision one-hot matmuls + the concat
#                                    assembly cost more than the flat
#                                    scatter's 86k extra rows. Kept opt-in.
#   hybrid fwd + multi-op XLA bwd    5.44 ms/step   (19 per-field scatters
#                                    each pay a large fixed cost)
#   hybrid fwd + Pallas tile bwd     5.38 ms/step   ("bwd_pallas"; the
#                                    one-op kernel loses to the single flat
#                                    scatter that XLA fuses into the AdamW
#                                    table pass — same fusion effect as
#                                    round 1's scatter kernels)
# The mode is a per-call static argument (threaded from config through
# Embeddings); mode=None reads MAP_TPU_HYBRID_MODE at trace time (bench A/B
# knob), defaulting to "fwd".
_DEFAULT_MODE = "fwd"


_VALID_MODES = frozenset({"fwd", "fwd_split", "both", "matmul", "bwd",
                          "bwd_pallas"})


def _resolve_mode(mode):
    resolved = mode or _os.environ.get("MAP_TPU_HYBRID_MODE", _DEFAULT_MODE)
    if resolved not in _VALID_MODES:
        # A typo'd mode would otherwise silently fall through to the slowest
        # decomposed backward; fail loudly instead.
        raise ValueError(
            f"unknown hybrid mode {resolved!r} "
            f"(config.hybrid_mode / MAP_TPU_HYBRID_MODE); "
            f"valid: {sorted(_VALID_MODES)}")
    return resolved


def field_groups(bounds, pack: int, nresv: int = 10):
    """Split fields by block size. bounds: static tuple of (lo, hi) logical
    id ranges per field. Returns (small, big): small = tuple of
    (field, lo, hi, plo, pe) with [plo, pe) the physical-row window; big =
    tuple of field indices.

    A small field whose block starts below nresv would make 'reserved' and
    'in-block' overlap (double-counting that id's gradient in the decomposed
    backward modes), so such fields take the flat path instead."""
    small, big = [], []
    for f, (lo, hi) in enumerate(bounds):
        if nresv <= lo and hi - lo <= SMALL_FIELD_MAX and hi > lo:
            plo = lo // pack
            pe = (hi - 1) // pack + 1
            small.append((f, lo, hi, plo, pe))
        else:
            big.append(f)
    # The backward's concatenation assembly requires the small blocks to be
    # ascending with monotone window ends (true for any field-blocked id
    # space: ranges are disjoint and ordered). Anything else -> flat path.
    for a, b in zip(small, small[1:]):
        if not (a[1] <= b[1] and a[4] <= b[4] and a[3] <= b[3]):
            return (), tuple(range(len(bounds)))
    return tuple(small), tuple(big)


def _resv_pe(nresv: int, pack: int) -> int:
    return max(1, -(-nresv // pack))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _small_plan(small, pack):
    """(pos, plo, pe) plan for the Pallas kernels + the field indices."""
    plan = tuple((pos, plo, pe)
                 for pos, (fi, lo, hi, plo, pe) in enumerate(small))
    idx = [fi for fi, *_ in small]
    return plan, idx


def _phys_small(ids, small, pack):
    """(Fs, B) physical ids, -1 where the id is outside the field's block
    (reserved/invalid rows are handled by the separate tiny-table term)."""
    cols = [fi for fi, *_ in small]
    sub = ids[:, cols]                                   # (B, Fs)
    lo = jnp.asarray([lo for _, lo, *_ in small], jnp.int32)
    hi = jnp.asarray([hi for _, _, hi, *_ in small], jnp.int32)
    in_block = (sub >= lo[None, :]) & (sub < hi[None, :])
    return jnp.where(in_block, sub // pack, -1).T.astype(jnp.int32)


def _gather_wide(packed, ids, bounds, pack, nresv, mode=None):
    """Forward: (R, W) packed table + (B, F) logical ids -> (B, F, W)."""
    b, f = ids.shape
    w = packed.shape[1]
    if _resolve_mode(mode) == "bwd":
        return jnp.take(packed, ids // pack, axis=0)
    small, big = field_groups(bounds, pack, nresv)
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
        small_idx = [fi for fi, *_ in small]
        # Forward stays in the multi-op XLA form: per-field sliced-block
        # gathers measured FASTER in-step than both the flat gather
        # (3.19 vs 3.99 ms/step at the canonical config) and the one-op
        # Pallas matmul form — the small sources stay resident and the
        # gathers pipeline. Reserved ids ride a per-field take from the
        # tiny [0, rpe) block, selected by a nested where. (The BACKWARD is
        # the opposite story: per-field XLA scatters each pay a large fixed
        # cost; see _hg_bwd.)
        outs = []
        for pos, (fi, lo, hi, plo, pe) in enumerate(small):
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
        order.extend(small_idx)
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if order == list(range(f)):
        return cat
    inv = [0] * f
    for pos, fi in enumerate(order):
        inv[fi] = pos
    return jnp.take(cat, jnp.asarray(inv, jnp.int32), axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def hybrid_rows_gather(packed: jnp.ndarray, ids: jnp.ndarray,
                       bounds, pack: int, nresv: int,
                       mode: str | None = None) -> jnp.ndarray:
    """Physical-row lookup (B, F) -> (B, F, W) with field-blocked routing.

    bounds/pack/nresv/mode are static; mode=None reads MAP_TPU_HYBRID_MODE
    at trace time. See module docstring for the contract."""
    return _gather_wide(packed, ids, bounds, pack, nresv, mode)


def _hg_fwd(packed, ids, bounds, pack, nresv, mode=None):
    # packed[:, :0]: zero-byte witness carrying the row count and dtype
    return _gather_wide(packed, ids, bounds, pack, nresv, mode), \
        (ids, packed[:, :0])


def _hg_bwd(bounds, pack, nresv, mode, res, g):
    """Dense (R, W) gradient. In the decomposed modes, small-field
    contributions are block-sized arrays ASSEMBLED BY CONCATENATION into one
    full-height array (overlap rows at block boundaries are statically folded
    into the preceding piece) — NOT by a chain of dynamic_update_slice
    read-modify-writes on the dense buffer, which serializes ~F_small
    full-buffer dependencies and measurably regresses the train step. The
    big-field scatter then lands in-place on the assembled array."""
    ids, witness = res
    r, dt = witness.shape[0], witness.dtype
    w = g.shape[-1]
    mode = _resolve_mode(mode)
    if mode in ("fwd", "fwd_split"):
        # ONE flat scatter over all B*F rows — XLA fuses it into the AdamW
        # dense table pass; beat every decomposed form until the matmul mode
        flat = (ids // pack).reshape(-1)
        gflat = g.astype(jnp.float32).reshape(-1, w)
        if mode == "fwd_split":
            # MFP corruption writes <mask>=3 into B*M ~ 29% of positions, so
            # the flat stream carries tens of thousands of SAME-ROW updates —
            # XLA scatter serializes duplicate-row adds. Split the reserved
            # rows (ids < nresv: mask + padding) out analytically: their
            # contribution is a dense masked SUM (one VPU pass over g), and
            # the remaining scatter carries only natural-id duplicates.
            # Bit-exactness caveat: the f32 sum order differs from the
            # scatter's fold order (~1 ulp class), so this is an opt-in mode.
            rpe = _resv_pe(nresv, pack)
            is_resv = (ids < nresv).reshape(-1)
            resv_rows = []
            for j in range(rpe):
                hit = (is_resv & (flat == j))[:, None]
                resv_rows.append(jnp.sum(jnp.where(hit, gflat, 0.0), axis=0))
            safe = jnp.where(is_resv, jnp.int32(r), flat)
            dense = jnp.zeros((r, w), jnp.float32).at[safe].add(
                gflat, mode="drop")
            return dense.at[:rpe].add(jnp.stack(resv_rows)).astype(dt), None
        return jnp.zeros((r, w), jnp.float32).at[flat].add(
            gflat).astype(dt), None
    small, big = field_groups(bounds, pack, nresv)
    g = g.astype(jnp.float32)
    phys = ids // pack
    if small:
        rpe = _resv_pe(nresv, pack)
        small_idx = [fi for fi, *_ in small]
        sub = ids[:, small_idx]                            # (B, Fs)
        g_sub = g[:, small_idx]                            # (B, Fs, W)
        is_resv = sub < nresv
        # reserved ids: <= rpe destination rows -> masked sums, no scatter.
        # (field_groups guarantees small-field blocks start at >= nresv, so
        # 'reserved' and 'in-block' are disjoint — no double count.)
        resv_rows = []
        for j in range(rpe):
            hit = (is_resv & (sub // pack == j))[..., None]
            resv_rows.append(jnp.sum(jnp.where(hit, g_sub, 0.0), axis=(0, 1)))
        resv_acc = jnp.stack(resv_rows)                    # (rpe, W)
        if mode == "matmul":
            dense = _assemble_matmul(ids, g_sub, small, pack, r, w, phys)
        elif mode == "bwd_pallas" and _on_tpu() and _pallas_tiles_ok(small, r):
            from map_tpu.ops.pallas_field_gather import (
                assemble_dense, field_block_scatter, plan_pairs)

            plan, _ = _small_plan(small, pack)
            stack = field_block_scatter(
                g_sub.reshape(g_sub.shape[0], -1),
                _phys_small(ids, small, pack), small=plan, r=r)
            dense = assemble_dense(stack, plan_pairs(plan, r)[0], r)
        else:
            dense = _assemble_xla(ids, g_sub, small, pack, r, w, phys)
        dense = dense.at[:rpe].add(resv_acc)
    else:
        dense = jnp.zeros((r, w), jnp.float32)
    if big:
        big_idx = list(big)
        dense = dense.at[phys[:, big_idx].reshape(-1)].add(
            g[:, big_idx].reshape(-1, w))
    return dense.astype(dt), None


def _pallas_tiles_ok(small, r: int) -> bool:
    """field_block_scatter reshapes the packed row space into full TILE-row
    stacks; tables below ROW_ALIGN rows are not tile-aligned (packed_rows
    only rounds up at >= 512 rows), so route those to the XLA assembly."""
    from map_tpu.ops.pallas_field_gather import TILE

    return r % TILE == 0


def _assemble_matmul(ids, g_sub, small, pack, r, w, phys):
    """Small-field gradients as per-field one-hot MXU matmuls: for field f
    with an s-row physical block, block_grad = onehot(local)^T @ g_f — an
    (s, B) x (B, W) matmul in f32 (precision=HIGHEST keeps the f32 operand
    exact; each output element is a sum of selected g rows, the same values a
    scatter-add would fold). Matmuls carry none of the large per-op fixed
    cost that made per-field XLA scatters regress (5.44 ms/step, round 2);
    the flat scatter is left to handle only the big-field rows."""
    contribs = []
    for pos, (fi, lo, hi, plo, pe) in enumerate(small):
        idf = ids[:, fi]
        in_block = (idf >= lo) & (idf < hi)
        gf = jnp.where(in_block[:, None], g_sub[:, pos], 0.0)      # (B, W)
        s = pe - plo
        local = jnp.clip(phys[:, fi] - plo, 0, s - 1)
        onehot = (jax.lax.iota(jnp.int32, s)[:, None]
                  == local[None, :]).astype(jnp.float32)           # (s, B)
        bg = jax.lax.dot(onehot, gf,
                         precision=jax.lax.Precision.HIGHEST)      # (s, W)
        contribs.append((plo, bg))
    return _concat_blocks(contribs, r, w)


def _assemble_xla(ids, g_sub, small, pack, r, w, phys):
    """CPU/fallback small-field gradient: per-field block scatters assembled
    by concatenation (overlap rows at block boundaries folded into the
    preceding piece)."""
    contribs = []  # (row_start, block_grad) in ascending row order
    for pos, (fi, lo, hi, plo, pe) in enumerate(small):
        idf = ids[:, fi]
        in_block = (idf >= lo) & (idf < hi)
        gf = g_sub[:, pos]
        s = pe - plo
        # out-of-block -> slot s (dropped by the slice); values are also
        # masked because .at[] wraps negatives numpy-style before 'drop'
        local = jnp.where(in_block,
                          jnp.clip(phys[:, fi] - plo, 0, s - 1),
                          jnp.int32(s))
        bg = jnp.zeros((s + 1, w), jnp.float32).at[local].add(
            jnp.where(in_block[:, None], gf, 0.0))[:s]
        contribs.append((plo, bg))
    return _concat_blocks(contribs, r, w)


def _concat_blocks(contribs, r, w):
    """Assemble ascending (row_start, block_grad) pieces into an (r, w) array
    by concatenation, folding boundary-overlap rows into the prior piece."""
    parts, cursor = [], 0
    for start, arr in contribs:
        if start > cursor:
            parts.append(jnp.zeros((start - cursor, w), jnp.float32))
            cursor = start
        elif start < cursor:  # boundary overlap: fold head into prior piece
            ov = min(cursor - start, arr.shape[0])
            prev = parts[-1]
            parts[-1] = prev.at[prev.shape[0] - ov:].add(arr[:ov])
            arr = arr[ov:]
        if arr.shape[0]:
            parts.append(arr)
            cursor += arr.shape[0]
    if cursor < r:
        parts.append(jnp.zeros((r - cursor, w), jnp.float32))
    return (jnp.concatenate(parts, axis=0) if parts
            else jnp.zeros((r, w), jnp.float32))


hybrid_rows_gather.defvjp(_hg_fwd, _hg_bwd)
