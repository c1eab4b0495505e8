"""Duplicate-folding scatter-add: the take-4 gradient path for huge candidate
sets (ROADMAP round-2 item 1).

XLA's scatter-add serializes row updates (~140 ns/row at E=32 on v5e:
~105 ms for the MFP candidate set of B*M*(1+k) ~ 745k rows). But CTR unigram
noise is Zipf-distributed, so the 745k draws hit only a few tens of thousands
of DISTINCT ids. This pipeline folds duplicates before the scatter:

1. sort ids (carrying the permutation) — `lax.sort_key_val`, ~3 ms;
2. permute the row-gradients (one gather) and prefix-sum them (`cumsum`);
3. locate segment boundaries (id changes) and compact the first-positions of
   the first `capacity` segments TO THE FRONT with a second key-value sort
   (binary-search compaction is off the table: `searchsorted` with n queries
   costs ~110 ms on TPU — measured, benchmarks/bench_dedup_parts.py);
4. per compacted segment, the folded gradient is the cumsum difference
   between the segment's last and previous-segment's last positions (two
   row gathers);
5. scatter only the <= capacity unique rows.

When the batch has more than `capacity` distinct ids, a `lax.cond` falls back
to the plain full scatter (correctness never depends on the distribution).

Numerics: step 4 computes segment sums as f32 prefix differences, so a
segment's error is bounded by the rounding of the prefix up to it (relative to
the full-stream magnitude, ~1e-4 absolute for N(0,1) gradients at 745k rows)
— negligible against SGD gradient noise; the unit tests pin the tolerance.

The reference counterpart is torch's native scatter-add under
`nn.Embedding` backward (`code/nce/index_linear.py:99-100`); this file is the
TPU-native re-design of that hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_CAPACITY = 1 << 17  # 131072 unique rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dedup_compact(flat_ids: jnp.ndarray, g: jnp.ndarray, vocab_size: int,
                   capacity: int):
    """Sort + fold duplicates + compact. Returns (uids, vals, num_unique,
    sids, sg) with uids/vals of length `capacity` (sentinel-padded)."""
    n, e = g.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    sids, order = jax.lax.sort_key_val(flat_ids, iota)
    sg = jnp.take(g, order, axis=0)

    first = jnp.concatenate([jnp.ones(1, jnp.bool_), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1      # segment idx per pos
    num_unique = seg[-1] + 1

    # compact segment-start positions to the front: sort (key=segment idx for
    # firsts else n, value=position). Slot j then holds start_pos of segment j.
    key = jnp.where(first, seg, jnp.int32(n))
    _, start_pos = jax.lax.sort_key_val(key, iota)
    start_pos = start_pos[:capacity]                   # (C,)
    j = jnp.arange(capacity, dtype=jnp.int32)
    valid = j < num_unique
    # segment j ends right before segment j+1 starts
    next_start = jnp.where(j + 1 < num_unique,
                           jnp.roll(start_pos, -1), jnp.int32(n))
    end_pos = jnp.clip(next_start - 1, 0, n - 1)

    cs = jnp.cumsum(sg, axis=0)
    hi = jnp.take(cs, end_pos, axis=0)
    lo = jnp.where((start_pos > 0)[:, None],
                   jnp.take(cs, jnp.maximum(start_pos - 1, 0), axis=0), 0.0)
    vals = jnp.where(valid[:, None], hi - lo, 0.0)
    uids = jnp.where(valid, jnp.take(sids, jnp.minimum(start_pos, n - 1)),
                     jnp.int32(vocab_size))            # sentinel -> dropped
    return uids, vals, num_unique, sids, sg


@partial(jax.jit, static_argnums=(2, 3))
def dedup_scatter_add(ids: jnp.ndarray, grads: jnp.ndarray, vocab_size: int,
                      capacities=(1 << 15, 1 << 16, DEFAULT_CAPACITY)
                      ) -> jnp.ndarray:
    """ids (...,) int32, grads (..., E) -> dense (vocab_size, E) f32 gradient.

    Equivalent to `jax.ops.segment_sum(grads, ids, vocab_size)` but folds
    duplicate ids before scattering (see module docstring). `capacities` is an
    ascending tuple of compaction tiers; the scatter cost is linear in the
    chosen tier (~140 ns/row), so the smallest tier that fits num_unique wins.
    """
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    g = grads.reshape(-1, grads.shape[-1]).astype(jnp.float32)
    n, e = g.shape
    tiers = sorted({min(c, n) for c in capacities})
    cap_max = tiers[-1]

    uids, vals, num_unique, sids, sg = _dedup_compact(flat_ids, g,
                                                      vocab_size, cap_max)

    def scatter_tier(c):
        # slots beyond num_unique are sentinel-padded, so any prefix >= the
        # unique count scatters the complete folded gradient
        def run(_):
            return jnp.zeros((vocab_size, e), jnp.float32).at[uids[:c]].add(
                vals[:c], mode="drop", indices_are_sorted=True)
        return run

    def fallback(_):
        return jnp.zeros((vocab_size, e), jnp.float32).at[sids].add(
            sg, indices_are_sorted=True)

    return _pick_tier(tiers, num_unique, scatter_tier, fallback, n)


@jax.custom_vjp
def gather_dedup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """`jnp.take(table, ids, axis=0)` whose backward folds duplicates before
    the scatter (dedup_scatter_add). Use for huge skewed candidate gathers
    (the NCE decoder's (B, M, 1+k) set)."""
    return jnp.take(table, ids, axis=0)


def _fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _bwd(res, gout):
    ids, v = res
    return dedup_scatter_add(ids, gout, v), None


gather_dedup.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused decoder candidate gather (unique-once forward + shared-sort backward)
#
# Per-row dynamic gathers/scatters cost ~10-40 ms per 745k-row op on v5e
# regardless of row width (<=128 B), so the design minimizes the COUNT of
# full-stream ops and keeps every stream at <=32 f32 columns (wider rows
# cross the native 128-byte access unit: a 33-column perm gather measured
# 3.5x slower than 32 — benchmarks/bench_dedup_parts.py):
#
# forward: sort candidate ids ONCE -> gather only the <=capacity UNIQUE rows
# from the big table (745k draws hit ~100k distinct ids under Zipf unigrams)
# -> expand to all positions by a small-source gather. The bias column is a
# direct 1-wide gather (unique+expand has no advantage at width 1).
#
# backward: reuses the forward's sort. Gradients are permuted per stream
# (32-wide rows, 1-wide bias), folded by cumsum-difference at segment
# boundaries, and the COMPACTED (capacity-sized) values are concatenated so
# one scatter updates both tables ((V, E+1) then sliced) — scatter cost is
# per-row, so merging the two scatters is free.
#
# Both directions lax.cond-fallback to the plain paths when the batch has
# more than `capacity` distinct candidate ids.
# ---------------------------------------------------------------------------

DECODER_CAPACITY = DEFAULT_CAPACITY
# Scatter/gather cost is linear in the CAPACITY dispatched (v5e measurements,
# benchmarks/bench_dedup_parts.py: 131k x 33 scatter 20.8 ms vs 65k 10.9 ms),
# so _pick_tier can choose the smallest tier >= num_unique via nested
# lax.cond. MEASURED on the canonical MFP step however (num_unique ~111k,
# benchmarks/bench_mfp.py): the multi-tier program costs ~11 ms MORE than a
# single-capacity cond (88.3 vs 77.3 ms/step — the extra cond levels defeat
# fusion), so the default is ONE tier; override DECODER_TIERS for workloads
# whose unique count is far below capacity.
DECODER_TIERS = (DECODER_CAPACITY,)


def _pick_tier(tiers, num_unique, build_small, build_fallback, n):
    """Nested conds, smallest tier outermost; each branch body is built lazily
    inside its cond so only the taken tier executes at runtime. build_small(c)
    returns the body for capacity c; build_fallback handles num_unique >
    max(tiers) (never taken when max(tiers) >= n)."""

    def make(idx):
        c = tiers[idx]
        small = build_small(c)
        if idx == len(tiers) - 1:
            if c >= n:
                return small
            return lambda _: jax.lax.cond(num_unique <= c, small,
                                          build_fallback, None)
        bigger = make(idx + 1)
        return lambda _: jax.lax.cond(num_unique <= c, small, bigger, None)

    return make(0)(None)


def _sort_ids(flat_ids: jnp.ndarray, capacity: int):
    """One sort shared by forward and backward. Returns
    (sids, order, u_of_orig, uids_c, start_pos, end_pos, valid, num_unique):
    u_of_orig[p] = unique-slot of original position p; uids_c = compacted
    unique ids (sentinel n beyond num_unique)."""
    n = flat_ids.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sids, order = jax.lax.sort_key_val(flat_ids, iota)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = seg[-1] + 1
    # unique-slot per ORIGINAL position (inverse permutation of seg)
    _, u_of_orig = jax.lax.sort_key_val(order, seg)
    # compact segment-start positions to the front (see module docstring)
    key = jnp.where(first, seg, jnp.int32(n))
    _, start_pos = jax.lax.sort_key_val(key, iota)
    start_pos = start_pos[:capacity]
    j = jnp.arange(capacity, dtype=jnp.int32)
    valid = j < num_unique
    next_start = jnp.where(j + 1 < num_unique,
                           jnp.roll(start_pos, -1), jnp.int32(n))
    end_pos = jnp.clip(next_start - 1, 0, n - 1)
    uids_c = jnp.where(valid, jnp.take(sids, jnp.minimum(start_pos, n - 1)),
                       jnp.int32(n))  # n is never a valid id slot marker use
    return sids, order, u_of_orig, uids_c, start_pos, end_pos, valid, num_unique


def _fold_stream(g_perm: jnp.ndarray, start_pos, end_pos, valid):
    """Segment sums of a SORTED gradient stream at the compacted slots."""
    n = g_perm.shape[0]
    cs = jnp.cumsum(g_perm, axis=0)
    hi = jnp.take(cs, end_pos, axis=0)
    lo = jnp.where((start_pos > 0)[:, None],
                   jnp.take(cs, jnp.maximum(start_pos - 1, 0), axis=0), 0.0)
    return jnp.where(valid[:, None], hi - lo, 0.0)


def _fold_stream2(gr_s, gb_s, start_pos, end_pos, valid):
    """Fold the row-grad (n, E) and bias-grad (n, 1) streams.

    A single-pass Pallas block-cumsum over the concatenated 128-lane stream
    (ops/pallas_scan.block_cumsum) was built and MEASURED for this fold:
    5.08 ms standalone (no better than XLA's 5.5 — the sequential grid +
    log-scan shift-adds eat the bandwidth advantage) and 73.4 ms in-step
    (vs 43.7 — the pallas_call materialization barrier defeats the fusion
    around the fold). Same lesson as every mid-pipeline kernel attempt;
    the two plain XLA folds stay."""
    return (_fold_stream(gr_s, start_pos, end_pos, valid),
            _fold_stream(gb_s, start_pos, end_pos, valid))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def decoder_gather(emb: jnp.ndarray, bias: jnp.ndarray, ids: jnp.ndarray,
                   use_pallas_scatter: bool = False):
    """Candidate gather for the NCE decoder: rows (..., E) from `emb` (V, E)
    and scalars (...,) from `bias` (V,), sharing one id set (the two
    index_selects at reference `code/nce/index_linear.py:99-100`).

    use_pallas_scatter: static — the folded compact scatter runs through the
    Pallas sorted-unique one-hot-matmul kernel
    (ops/pallas_scatter.scatter_unique_sorted: 12.5 vs 20.5 ms at the
    canonical MFP scale, bit-exact) instead of XLA's serialized scatter."""
    return jnp.take(emb, ids, axis=0), jnp.take(bias, ids)


def _dg_fwd(emb, bias, ids, use_pallas_scatter=False):
    v, e = emb.shape
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tiers = tuple(sorted({min(c, n) for c in DECODER_TIERS}))
    capacity = tiers[-1]
    (sids, order, u_of_orig, uids_c, start_pos, end_pos, valid,
     num_unique) = _sort_ids(flat, capacity)

    def unique_tier(c):
        def run(_):
            # u_of_orig < num_unique <= c, so the [:c] prefix covers all slots
            safe_uids = jnp.minimum(uids_c[:c], v - 1)    # sentinels unused
            compact = jnp.take(emb, safe_uids, axis=0)    # (c, E) small gather
            cb = jnp.take(bias, safe_uids)                # (c,) bias rows
            rows = jnp.take(compact, u_of_orig, axis=0)   # small-source expand
            return rows, jnp.take(cb, u_of_orig)

        return run

    def direct_path(_):
        return jnp.take(emb, flat, axis=0), jnp.take(bias, flat)

    rows_flat, b_flat = _pick_tier(tiers, num_unique, unique_tier,
                                   direct_path, n)
    rows = rows_flat.reshape(*ids.shape, e)
    b = b_flat.reshape(ids.shape)
    res = (flat, ids.shape, v, sids, order, uids_c, start_pos, end_pos,
           valid, num_unique)
    return (rows, b), res


def _dg_bwd(use_pallas_scatter, res, gout):
    (flat, ids_shape, v, sids, order, uids_c, start_pos, end_pos, valid,
     num_unique) = res
    g_rows, g_b = gout
    e = g_rows.shape[-1]
    gr = g_rows.reshape(-1, e).astype(jnp.float32)
    gb = g_b.reshape(-1).astype(jnp.float32)
    n = gr.shape[0]
    capacity = start_pos.shape[0]
    tiers = tuple(sorted({min(c, n) for c in DECODER_TIERS}))
    assert tiers[-1] == capacity

    gr_s = jnp.take(gr, order, axis=0)                    # 32-wide perm
    gb_s = jnp.take(gb, order)[:, None]                   # 1-wide perm

    def folded_tier(c):
        def run(_):
            vals_e = _fold_stream(gr_s, start_pos, end_pos, valid)
            vals_b = _fold_stream(gb_s, start_pos, end_pos, valid)
            vals = jnp.concatenate([vals_e, vals_b], axis=1)  # (C, E+1) tiny
            uids_safe = jnp.where(valid, uids_c, jnp.int32(v))  # sentinel -> drop
            if use_pallas_scatter:
                from map_tpu.ops.pallas_scatter import scatter_unique_sorted

                out = scatter_unique_sorted(uids_safe[:c], vals[:c], v)
            else:
                out = jnp.zeros((v, e + 1), jnp.float32).at[uids_safe[:c]].add(
                    vals[:c], mode="drop", indices_are_sorted=True)
            return out[:, :e], out[:, e]

        return run

    def fallback(_):
        g_all = jnp.concatenate([gr_s, gb_s], axis=1)
        out = jnp.zeros((v, e + 1), jnp.float32).at[sids].add(
            g_all, indices_are_sorted=True)
        return out[:, :e], out[:, e]

    d_emb, d_bias = _pick_tier(tiers, num_unique, folded_tier, fallback, n)
    return d_emb, d_bias, None


decoder_gather.defvjp(_dg_fwd, _dg_bwd)


# ---------------------------------------------------------------------------
# Lane-packed variant (map_tpu.ops.packed_table): emb stored (V/pe, pe*E) and
# bias (V/pb, pb), pe = 128 // E, pb = 128. Same unique-once forward and
# folded backward, but the compact scatters write 128-lane rows — XLA's
# scatter is ~6x faster per row at 128 lanes than at narrow rows (measured,
# benchmarks/bench_packed_probe.py: 98k-row scatter 10.9 ms at 16 lanes vs
# 1.9 ms at 128), so the two packed scatters beat the one merged narrow one.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def decoder_gather_packed(emb_packed: jnp.ndarray, bias_packed: jnp.ndarray,
                          ids: jnp.ndarray, embed_size: int, vocab: int):
    """Packed-storage twin of decoder_gather. emb_packed (V/pe, pe*E),
    bias_packed (V/pb, pb); returns rows (..., E) and bias scalars (...,)."""
    from map_tpu.ops.packed_table import packed_lookup

    rows = packed_lookup(emb_packed, ids, embed_size)
    b = packed_lookup(bias_packed, ids, 1)[..., 0]
    return rows, b


def _dgp_fwd(emb_packed, bias_packed, ids, embed_size, vocab):
    from map_tpu.ops.packed_table import pack_factor
    from map_tpu.parallel.context import table_mesh

    e = embed_size
    pe = pack_factor(e)
    pb = bias_packed.shape[1]
    mesh = table_mesh()
    if mesh is not None:
        from map_tpu.parallel.mesh import MODEL_AXIS

        num = mesh.shape[MODEL_AXIS]
        if emb_packed.shape[0] % num or bias_packed.shape[0] % num:
            mesh = None  # non-divisible tables stay replicated (sharding.py)
    flat = ids.reshape(-1).astype(jnp.int32)
    if mesh is not None:
        # sharded tables: the dedup machinery (sort/fold/compact) runs on the
        # REPLICATED candidate stream — the allgather of (n,) int32 ids is
        # tiny against table bandwidth — and only the physical-row table ops
        # go through the shard_map masked-gather / shard-local-scatter pair
        from jax.sharding import PartitionSpec as P

        flat = jax.lax.with_sharding_constraint(
            flat, jax.sharding.NamedSharding(mesh, P()))
    n = flat.shape[0]
    tiers = tuple(sorted({min(c, n) for c in DECODER_TIERS}))
    capacity = tiers[-1]
    (sids, order, u_of_orig, uids_c, start_pos, end_pos, valid,
     num_unique) = _sort_ids(flat, capacity)

    def _take_rows(tab, phys_idx):
        if mesh is not None:
            from map_tpu.parallel.embedding import sharded_rows_gather

            return sharded_rows_gather(tab, phys_idx, mesh)
        return jnp.take(tab, phys_idx, axis=0)

    def _gather_at(idx):
        from map_tpu.ops.packed_table import select_sub_block

        rows = select_sub_block(_take_rows(emb_packed, idx // pe),
                                idx % pe, e)
        # bias: per-row pick of 1 lane out of pb — a row-dot with the one-hot
        # stays layout-friendly at width 1
        sub_b = jax.nn.one_hot(idx % pb, pb, dtype=bias_packed.dtype)
        rb = _take_rows(bias_packed, idx // pb)
        return rows, jnp.einsum("cp,cp->c", sub_b, rb)

    def unique_tier(c):
        def run(_):
            safe_uids = jnp.minimum(uids_c[:c], vocab - 1)
            compact, cb = _gather_at(safe_uids)
            # Bias expand rides a 32-LANE broadcast source: a 1-wide gather
            # is per-row priced ~2x a 32-wide one (7.99 vs 3.99 ms at 745k,
            # bench_mfp_parts round 3 — lane-padding means narrow rows read
            # the same 128-lane tile anyway). The barrier keeps XLA from
            # folding the broadcast back into a narrow gather.
            cbw = jax.lax.optimization_barrier(
                jnp.broadcast_to(cb[:, None], (cb.shape[0], 32)))
            return (jnp.take(compact, u_of_orig, axis=0),
                    jnp.take(cbw, u_of_orig, axis=0)[:, 0])

        return run

    def direct_path(_):
        return _gather_at(flat)

    rows_flat, b_flat = _pick_tier(tiers, num_unique, unique_tier,
                                   direct_path, n)
    rows = rows_flat.reshape(*ids.shape, e)
    b = b_flat.reshape(ids.shape)
    res = (flat, emb_packed.shape, bias_packed.shape, sids, order, uids_c,
           start_pos, end_pos, valid, num_unique)
    return (rows, b), res


def _dgp_scatter_sorted(embed_size, vocab, res, gr_s, gb_s):
    """Fold the SORTED gradient streams (gr_s (n, E), gb_s (n, 1)) and
    scatter into packed (emb, bias) gradients — the shared back half of
    _dgp_bwd and _dsp_bwd."""
    from map_tpu.ops.packed_table import expand_to_packed, pack_factor
    from map_tpu.parallel.context import table_mesh

    (flat, emb_shape, bias_shape, sids, order, uids_c, start_pos, end_pos,
     valid, num_unique) = res
    e = embed_size
    pe = pack_factor(e)
    pb = bias_shape[1]
    mesh = table_mesh()
    if mesh is not None:
        from map_tpu.parallel.mesh import MODEL_AXIS

        num = mesh.shape[MODEL_AXIS]
        if emb_shape[0] % num or bias_shape[0] % num:
            mesh = None  # mirror the forward's divisibility guard
    n = gr_s.shape[0]
    capacity = start_pos.shape[0]
    tiers = tuple(sorted({min(c, n) for c in DECODER_TIERS}))
    assert tiers[-1] == capacity

    def _scatter_rows(shape, phys_idx, wide, sorted_ids):
        if mesh is not None:
            from map_tpu.parallel.embedding import sharded_rows_scatter_add

            return sharded_rows_scatter_add(phys_idx, wide, shape[0], mesh,
                                            indices_are_sorted=sorted_ids)
        return jnp.zeros(shape, jnp.float32).at[phys_idx].add(
            wide, mode="drop", indices_are_sorted=sorted_ids)

    def _scatter_at(idx, vals_e, vals_b, sorted_ids):
        # sentinel ids (== vocab) land at physical row vocab//p, inside the
        # alignment padding or past the table -> zero-valued or dropped
        wide_e = expand_to_packed(vals_e, idx % pe, pe)
        d_emb = _scatter_rows(emb_shape, idx // pe, wide_e, sorted_ids)
        wide_b = expand_to_packed(vals_b, idx % pb, pb)
        d_bias = _scatter_rows(bias_shape, idx // pb, wide_b, sorted_ids)
        return d_emb, d_bias

    # Sparse-stream fused AdamW handoff (ops/sparse_adamw): when the noise
    # path registered a plan for this table (it traces first, in the step's
    # forward) and the compact stream covers every entry (capacity >= n ->
    # the compact branch is UNCONDITIONAL, no runtime fallback exists), ship
    # the emb gradient as the ENCODED target stream instead of scattering it
    # dense — the optimizer folds it into the table pass. The bias table is
    # too small to hold an encoding; it keeps the dense scatter (4 MB table
    # — its dense pass is trivial).
    from map_tpu.ops import sparse_adamw as _sa

    plan = _sa.lookup(emb_shape) if _sa.enabled() else None
    if (plan is not None and mesh is None and capacity >= n
            and plan.n_targets == n and plan.pack == pe):
        vals_e, vals_b = _fold_stream2(gr_s, gb_s, start_pos, end_pos, valid)
        uids_safe = jnp.where(valid, uids_c, jnp.int32(vocab))
        # sentinel phys must land BEYOND the last tile (vocab//pe sits inside
        # the table's alignment padding, where a sentinel block between real
        # entries would break the kernel's 2-block window coverage)
        enc = _sa.encode_target(
            vals_e, jnp.where(valid, uids_c % pe, 0),
            jnp.where(valid, uids_c // pe, jnp.int32(emb_shape[0])),
            plan)
        wide_b = expand_to_packed(vals_b, uids_safe % pb, pb)
        d_bias = jnp.zeros(bias_shape, jnp.float32).at[uids_safe // pb].add(
            wide_b, mode="drop", indices_are_sorted=True)
        return enc, d_bias

    def folded_tier(c):
        def run(_):
            vals_e, vals_b = _fold_stream2(gr_s, gb_s, start_pos, end_pos,
                                           valid)
            uids_safe = jnp.where(valid, uids_c, jnp.int32(vocab))
            return _scatter_at(uids_safe[:c], vals_e[:c], vals_b[:c], True)

        return run

    def fallback(_):
        return _scatter_at(sids, gr_s, gb_s, True)

    return _pick_tier(tiers, num_unique, folded_tier, fallback, n)


def _dgp_bwd(embed_size, vocab, res, gout):
    g_rows, g_b = gout
    e = embed_size
    order = res[4]
    gr = g_rows.reshape(-1, e).astype(jnp.float32)
    gb = g_b.reshape(-1).astype(jnp.float32)
    gr_s = jnp.take(gr, order, axis=0)
    gb_s = jnp.take(gb, order)[:, None]
    d_emb, d_bias = _dgp_scatter_sorted(embed_size, vocab, res, gr_s, gb_s)
    return d_emb, d_bias, None


decoder_gather_packed.defvjp(_dgp_fwd, _dgp_bwd)


# ---------------------------------------------------------------------------
# Score-fused variant: the candidate-scoring einsum moves INSIDE the custom
# VJP, so the backward never materializes or permutes the (n, E) row-gradient
# stream in original order. The sorted stream is built directly:
#   gr_s[t] = h[pos_sorted[t]] * d_score_sorted[t]
# with d_score_sorted a 1-wide permute and the h gather a 32-wide take from
# the SMALL (B*M, E) per-position source — replacing _dgp_bwd's 32-wide
# permute against the (n, E) big source plus the separate 1-wide bias
# permute (and the einsum-VJP materialization of d_rows). Bitwise identical
# values: the same products are formed, computed after the permutation
# instead of before it.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def decoder_score_packed(emb_packed: jnp.ndarray, bias_packed: jnp.ndarray,
                         inputs: jnp.ndarray, ids: jnp.ndarray,
                         embed_size: int, vocab: int) -> jnp.ndarray:
    """Candidate logits for the NCE decoder on packed storage:
    inputs (B, M, E), ids (B, M, C) -> logits (B, M, C) =
    <inputs, emb[ids]> + bias[ids] (reference index_linear.py:86-106)."""
    from map_tpu.ops.packed_table import packed_lookup

    rows = packed_lookup(emb_packed, ids, embed_size)
    b = packed_lookup(bias_packed, ids, 1)[..., 0]
    return jnp.einsum("bme,bmce->bmc", inputs, rows) + b


def _dsp_fwd(emb_packed, bias_packed, inputs, ids, embed_size, vocab):
    (rows, b), res = _dgp_fwd(emb_packed, bias_packed, ids, embed_size, vocab)
    logits = jnp.einsum("bme,bmce->bmc", inputs, rows) + b
    return logits, (res, rows, inputs)


def _dsp_bwd(embed_size, vocab, resid, g):
    res, rows, inputs = resid
    order = res[4]
    c = g.shape[-1]
    d_h = jnp.einsum("bmc,bmce->bme", g, rows)
    pos_sorted = order // c                                # elementwise
    # d_score in sorted order via a stable RE-SORT of (ids, cotangent):
    # jax.lax.sort is stable, so this reproduces the forward's permutation
    # exactly, and a 745k sort_key_val costs ~3.3 ms where the 1-wide
    # permute jnp.take(gflat, order) costs ~7.9 (per-row priced;
    # benchmarks/bench_mfp_parts.py). A C-lane row gather + lane-select was
    # also tried earlier and REGRESSED in-step (lane padding, 381 MB
    # intermediate) — the re-sort keeps everything 1-lane.
    gflat = g.reshape(-1).astype(jnp.float32)
    _, d_score_sorted = jax.lax.sort_key_val(res[0], gflat)
    h2 = inputs.reshape(-1, inputs.shape[-1]).astype(jnp.float32)
    h_sorted = jnp.take(h2, pos_sorted, axis=0)            # small-source take
    gr_s = h_sorted * d_score_sorted[:, None]
    gb_s = d_score_sorted[:, None]
    d_emb, d_bias = _dgp_scatter_sorted(embed_size, vocab, res, gr_s, gb_s)
    return d_emb, d_bias, d_h, None


decoder_score_packed.defvjp(_dsp_fwd, _dsp_bwd)


# ---------------------------------------------------------------------------
# Shared-noise row lookup with an ENCODED cotangent (ops/sparse_adamw).
#
# The decoder emb param is used by two scoring paths whose cotangents JAX
# sums: the dedup target stream above and this tiny (F*k or k)-row noise
# lookup. Under the sparse-stream optimizer handoff the target cotangent is
# an encoding, so a dense noise cotangent summed into it would corrupt it
# silently — this VJP encodes the noise gradient into the buffer's DISJOINT
# noise region instead (the elementwise sum then composes the encoding).
# Engagement is decided by the same sparse_adamw.pf_plan as the target path.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def noise_rows_packed(emb_packed: jnp.ndarray, bias_packed: jnp.ndarray,
                      ids: jnp.ndarray, embed_size: int, vocab: int,
                      plan=None):
    """Packed-storage row + bias lookup for the tiny shared-noise id set,
    identical values to IndexLinearDecoder._lookup_rows; plan: a
    sparse_adamw.SparsePlan (static) controlling the encoded backward."""
    from map_tpu.ops.packed_table import packed_lookup

    return (packed_lookup(emb_packed, ids, embed_size),
            packed_lookup(bias_packed, ids, 1)[..., 0])


def _nr_fwd(emb_packed, bias_packed, ids, embed_size, vocab, plan=None):
    from map_tpu.ops import sparse_adamw as _sa

    if plan is not None:
        _sa.register(emb_packed.shape, plan)  # trace-order: before _dsp bwd
    out = noise_rows_packed(emb_packed, bias_packed, ids, embed_size, vocab,
                            plan)
    return out, (ids, emb_packed.shape, bias_packed.shape)


def _nr_bwd(embed_size, vocab, plan, res, gout):
    from map_tpu.ops import sparse_adamw as _sa
    from map_tpu.ops.packed_table import expand_to_packed, pack_factor

    ids, emb_shape, bias_shape = res
    g_rows, g_b = gout
    e = embed_size
    pe = pack_factor(e)
    pb = bias_shape[1]
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    gr = g_rows.reshape(-1, e).astype(jnp.float32)
    gb = g_b.reshape(-1, 1).astype(jnp.float32)
    # sort + fold duplicates + compact (everything here is k..F*k-sized)
    (sids, order, _u, uids_c, start_pos, end_pos, valid,
     _nu) = _sort_ids(flat, n)
    gr_s = jnp.take(gr, order, axis=0)
    gb_s = jnp.take(gb, order, axis=0)
    vals_e, vals_b = _fold_stream2(gr_s, gb_s, start_pos, end_pos, valid)
    assert plan is not None and plan.pack == pe
    enc = _sa.encode_noise(
        vals_e, jnp.where(valid, uids_c % pe, 0),
        jnp.where(valid, uids_c // pe, jnp.int32(emb_shape[0])), plan)
    uids_safe = jnp.where(valid, uids_c, jnp.int32(vocab))
    wide_b = expand_to_packed(vals_b, uids_safe % pb, pb)
    d_bias = jnp.zeros(bias_shape, jnp.float32).at[uids_safe // pb].add(
        wide_b, mode="drop", indices_are_sorted=True)
    return enc, d_bias, None


noise_rows_packed.defvjp(_nr_fwd, _nr_bwd)


# ---------------------------------------------------------------------------
# Backward-only dedup for SMALL candidate streams (the pf-shared target
# scores: 28.7k rows at the canonical config).
#
# decoder_score_packed's unique-once forward exists for the 745k per-position
# stream; at 28.7k the compact-gather+expand forward costs about the same as
# a plain lookup, but its THREE forward sorts are pure overhead when the
# backward can rebuild everything with TWO: one multi-operand lax.sort
# carries (ids, position, d_score) together — lax.sort's stability
# reproduces the same permutation the forward sort would have produced — and
# one compaction sort locates segment starts. Values are bit-identical to
# the score-fused path (same folds, same scatter); only op scheduling moves.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def decoder_score_target(emb_packed: jnp.ndarray, bias_packed: jnp.ndarray,
                         inputs: jnp.ndarray, ids: jnp.ndarray,
                         embed_size: int, vocab: int) -> jnp.ndarray:
    """Target-only scores on packed storage: inputs (B, M, E), ids (B, M)
    -> (B, M) = <inputs, emb[ids]> + bias[ids], plain lookups forward,
    dedup-folded backward."""
    from map_tpu.ops.packed_table import packed_lookup

    rows = packed_lookup(emb_packed, ids, embed_size)
    b = packed_lookup(bias_packed, ids, 1)[..., 0]
    return jnp.einsum("bme,bme->bm", inputs, rows) + b


def _dst_fwd(emb_packed, bias_packed, inputs, ids, embed_size, vocab):
    from map_tpu.ops.packed_table import packed_lookup

    rows = packed_lookup(emb_packed, ids, embed_size)
    b = packed_lookup(bias_packed, ids, 1)[..., 0]
    out = jnp.einsum("bme,bme->bm", inputs, rows) + b
    return out, (ids, inputs, rows, emb_packed.shape, bias_packed.shape)


def _dst_bwd(embed_size, vocab, res, g):
    ids, inputs, rows, emb_shape, bias_shape = res
    e = embed_size
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    gflat = g.reshape(-1).astype(jnp.float32)
    d_h = g[..., None] * rows                           # (B, M, E)
    iota = jnp.arange(n, dtype=jnp.int32)
    # ONE stable sort carries position AND cotangent with the ids
    sids, order, d_score_sorted = jax.lax.sort(
        (flat, iota, gflat), num_keys=1)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = seg[-1] + 1
    key = jnp.where(first, seg, jnp.int32(n))
    _, start_pos = jax.lax.sort_key_val(key, iota)
    j = jnp.arange(n, dtype=jnp.int32)
    valid = j < num_unique
    next_start = jnp.where(j + 1 < num_unique,
                           jnp.roll(start_pos, -1), jnp.int32(n))
    end_pos = jnp.clip(next_start - 1, 0, n - 1)
    uids_c = jnp.where(valid, jnp.take(sids, jnp.minimum(start_pos, n - 1)),
                       jnp.int32(n))
    h2 = inputs.reshape(-1, inputs.shape[-1]).astype(jnp.float32)
    h_sorted = jnp.take(h2, order, axis=0)              # small-source take
    gr_s = h_sorted * d_score_sorted[:, None]
    gb_s = d_score_sorted[:, None]
    res2 = (flat, emb_shape, bias_shape, sids, order, uids_c, start_pos,
            end_pos, valid, num_unique)
    d_emb, d_bias = _dgp_scatter_sorted(e, vocab, res2, gr_s, gb_s)
    return d_emb, d_bias, d_h, None


decoder_score_target.defvjp(_dst_fwd, _dst_bwd)
