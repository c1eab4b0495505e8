"""Sparse-stream fused AdamW: fold the compact decoder-gradient stream
directly into the dense table-update pass (ROADMAP round-5 #1).

The decoupled weight decay (reference `code/trainer.py:61-72`) forces a dense
AdamW pass over every table row each step (param/mu/nu read+write — 6 HBM
accesses of the table footprint). The dedup backward (ops/dedup_scatter)
already produces the gradient as a COMPACT sorted stream of <= C unique-id
rows; the dense path then pays, on top of the mandatory 6 accesses:

  * an XLA scatter of the compact stream into a zeroed (R, 128) buffer
    (per-row priced, ~1.5 ms for the canonical 28.7k-row pf-shared stream);
  * the full-table zero-init write and the full-table gradient READ as the
    dense kernel's 7th access.

This kernel consumes the stream directly: each (128, 128) table tile applies
its slice of the stream via an exact one-hot MXU matmul-scatter and runs the
AdamW math in the same pass — the dense gradient never materializes.

Gradient transport ("encoded cotangent"): jax.grad requires the table
cotangent to be a dense (R, 128) array, so streams are ENCODED into one. The
decoder param is used by TWO scoring paths whose cotangents JAX SUMS — the
dedup target stream and the (tiny) shared-noise row lookup — so the buffer
carries two disjoint regions and each path's custom VJP writes only its own
(the elementwise sum then composes the encoding):

  rows [0, C)            target stream folded wide values, sorted by phys
  rows [C, 2C)           target stream physical rows, broadcast f32
  rows [R-2N, R-N)       noise stream folded wide values, sorted by phys
  rows [R-N, R)          noise stream physical rows, broadcast f32
  everything else        zeros

Atomic engagement: BOTH paths decide via the same `pf_plan(...)` pure
function of static shapes, so they either both encode or both stay dense —
a mixed state (dense grad summed into an encoding) would corrupt silently,
which is exactly what pf_plan exists to make impossible.

Exactness (vs the dense-gradient path):
  * within a stream, ids are UNIQUE logical ids and ids sharing a physical
    row occupy DISJOINT lane groups, so every (row, lane) output element
    receives at most one contribution per stream — target + noise can
    overlap, giving at most TWO, summed in f32 like the dense scatter;
  * f32 values ride the bf16 MXU as an exact 3-way split v = b1 + b2 + b3
    (24 mantissa bits = 3 x 8; each residual subtraction is Sterbenz-exact
    and the final f32 re-sum is exactly representable), with the one-hot
    side exactly representable in bf16.
  Gradient delivery is bit-exact for non-overlapping ids and ulp-exact for
  target/noise collisions (tests/test_sparse_adamw.py, test_sparse_step_e2e).

The compiled-in window logic needs NO runtime fallback: entries are unique
logical ids, so a 128-row tile covers at most 128*pe of them; each per-tile
window is the 2 aligned WBLK=128*pe-entry stream blocks starting at
floor(segment_start / WBLK), which always covers the tile's sorted,
contiguous segment. pf_plan only returns a plan when the dedup capacity
covers the whole target stream (capacity >= n — the cond-free compact
branch) and both encodings fit the table's row space.

Reference hot path being replaced: `/root/reference/code/nce/
index_linear.py:86-106` (index_add into a dense grad) + the dense torch
AdamW over the full table (`code/trainer.py:60-85`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import os as _os

# Output-tile rows per grid step. The matmul-scatter MACs scale LINEARLY in
# this (window = 2 x TILE_ROWS*pack entries per tile), grid overhead
# inversely; env-overridable for hardware A/B (benchmarks/bench_sparse_adamw).
TILE_ROWS = int(_os.environ.get("MAP_TPU_SPARSE_TILE", "128"))


# ---------------------------------------------------------------------------
# engagement plan + trace-time registry
# ---------------------------------------------------------------------------

from collections import namedtuple

# hashable so it can ride custom_vjp nondiff args and registry equality
SparsePlan = namedtuple(
    "SparsePlan",
    ["c_enc", "n_enc", "wblk", "rows", "pack", "n_targets", "n_noise"])

_enabled = False
_registry: dict = {}  # (rows, width) -> SparsePlan


def enable(flag: bool) -> None:
    """Master switch (set by Trainer / bench setup BEFORE tracing). Clearing
    also wipes the shape registry so stale encodings can't be decoded."""
    global _enabled
    _enabled = bool(flag)
    _registry.clear()


def enabled() -> bool:
    return _enabled


def pf_plan(rows: int, width: int, pack: int, n_targets: int,
            n_noise: int):
    """The SINGLE engagement decision, shared by the target-path VJP, the
    noise-path VJP and (via the registry) the optimizer. Pure function of
    static geometry — both scoring paths compute it from the same shapes, so
    they always agree. Returns the layout dict or None (stay dense)."""
    from map_tpu.ops.dedup_scatter import DECODER_TIERS

    if not _enabled or width != 128 or rows % TILE_ROWS:
        return None
    if n_targets > min(DECODER_TIERS):  # dedup fallback cond would exist
        return None
    wblk = TILE_ROWS * pack
    if rows % wblk:
        return None
    c_enc = -(-n_targets // wblk) * wblk
    c_enc = max(c_enc, 2 * wblk)
    n_enc = max(-(-n_noise // wblk) * wblk, 2 * wblk)
    if 2 * c_enc + 2 * n_enc > rows:
        return None
    return SparsePlan(int(c_enc), int(n_enc), int(wblk), int(rows),
                      int(pack), int(n_targets), int(n_noise))


def register(shape, plan) -> None:
    """Called by the encoding VJPs at trace time. A shape can only carry ONE
    encoding geometry — two same-shaped tables with different streams would
    be indistinguishable to the optimizer, so that collides loudly."""
    key = tuple(int(s) for s in shape)
    if key in _registry and _registry[key] != plan:
        raise ValueError(
            f"sparse_adamw: conflicting encodings for table shape {key}: "
            f"{_registry[key]} vs {plan}")
    _registry[key] = plan


def lookup(shape):
    if not _enabled:
        return None
    return _registry.get(tuple(int(s) for s in shape))


# ---------------------------------------------------------------------------
# encoding (runs inside the custom VJPs)
# ---------------------------------------------------------------------------

def _pad_stream(wide, physf, c_enc, rows):
    c = wide.shape[0]
    if c > c_enc:
        wide, physf = wide[:c_enc], physf[:c_enc]
    elif c < c_enc:
        wide = jnp.concatenate(
            [wide, jnp.zeros((c_enc - c, wide.shape[1]), jnp.float32)], 0)
        physf = jnp.concatenate(
            [physf, jnp.full((c_enc - c,), float(rows), jnp.float32)], 0)
    return wide, physf


def encode_target(vals, sub_slot, phys, plan) -> jnp.ndarray:
    """Target-region encoding: vals (C, E) f32 folded unique-id values
    sorted by id (zeros at sentinel slots); sub_slot = id %% pack; phys =
    id // pack ascending with sentinels >= rows. Returns (rows, 128) f32
    that is zero outside the target region."""
    from map_tpu.ops.packed_table import expand_to_packed

    rows, c_enc = plan.rows, plan.c_enc
    wide = expand_to_packed(vals, sub_slot, plan.pack)
    wide, physf = _pad_stream(wide, phys.astype(jnp.float32), c_enc, rows)
    register((rows, 128), plan)
    return jnp.concatenate([
        wide,
        jnp.broadcast_to(physf[:, None], (c_enc, 128)),
        jnp.zeros((rows - 2 * c_enc, 128), jnp.float32),
    ], axis=0)


def encode_noise(vals, sub_slot, phys, plan) -> jnp.ndarray:
    """Noise-region twin of encode_target (zero outside [rows-2N, rows))."""
    from map_tpu.ops.packed_table import expand_to_packed

    rows, n_enc = plan.rows, plan.n_enc
    wide = expand_to_packed(vals, sub_slot, plan.pack)
    wide, physf = _pad_stream(wide, phys.astype(jnp.float32), n_enc, rows)
    register((rows, 128), plan)
    return jnp.concatenate([
        jnp.zeros((rows - 2 * n_enc, 128), jnp.float32),
        wide,
        jnp.broadcast_to(physf[:, None], (n_enc, 128)),
    ], axis=0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _split3(v):
    """Exact 3-way bf16 split of f32 (see module docstring)."""
    b1 = v.astype(jnp.bfloat16)
    r1 = v - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    r2 = r1 - b2.astype(jnp.float32)
    b3 = r2.astype(jnp.bfloat16)
    return b1, b2, b3


def _window_plan(phys: jnp.ndarray, num_tiles: int, t: int, wblk: int,
                 num_blocks: int):
    """Per-tile window block index into a sorted phys stream — the block
    holding the first entry of the tile's segment, clamped so block j0+1
    stays inside the region (the clamp preserves coverage: the window start
    never moves past the segment start and the end only ever moves to the
    region end) — plus two nonempty bits so the kernel can SKIP half-window
    matmuls: half h executes iff the tile's segment [s, e) intersects block
    j0+h. Half 0 is live whenever the segment is nonempty; half 1 only when
    the segment crosses the block boundary (~cnt/wblk of tiles)."""
    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * t
    starts = jnp.searchsorted(phys, bounds).astype(jnp.int32)
    s, e = starts[:-1], starts[1:]
    j0 = jnp.clip(s // wblk, 0, num_blocks - 2)
    ne0 = (e > j0 * wblk) & (s < (j0 + 1) * wblk)
    ne1 = (e > (j0 + 1) * wblk) & (s < (j0 + 2) * wblk)
    return j0, ne0.astype(jnp.int32), ne1.astype(jnp.int32)


@partial(jax.jit, static_argnames=("c_enc", "n_enc", "wblk", "interpret"))
def sparse_fused_adamw(p: jnp.ndarray, mu: jnp.ndarray, nu: jnp.ndarray,
                       enc: jnp.ndarray, scalars: jnp.ndarray,
                       c_enc: int, n_enc: int, wblk: int,
                       interpret: bool = False):
    """One-pass AdamW on a (R, 128) table whose gradient arrives as the
    encoded target + noise streams (see module docstring). Returns (new_p,
    new_mu, new_nu), p/mu/nu aliased in-place. scalars as
    fused_adamw.pack_scalars."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from map_tpu.ops.fused_adamw import _adamw_math

    r = p.shape[0]
    t = TILE_ROWS
    assert r % t == 0 and c_enc % wblk == 0 and n_enc % wblk == 0
    assert 2 * c_enc + 2 * n_enc <= r and r % wblk == 0
    num_tiles = r // t
    noise_v0 = (r - 2 * n_enc) // wblk   # block offsets inside enc
    noise_p0 = (r - n_enc) // wblk

    phys_t = jax.lax.slice(enc, (c_enc, 0), (2 * c_enc, 1)).reshape(-1)
    phys_n = jax.lax.slice(enc, (r - n_enc, 0), (r, 1)).reshape(-1)
    j0t, t_ne0, t_ne1 = _window_plan(phys_t.astype(jnp.int32), num_tiles,
                                     t, wblk, c_enc // wblk)
    j0n, n_ne0, n_ne1 = _window_plan(phys_n.astype(jnp.int32), num_tiles,
                                     t, wblk, n_enc // wblk)
    flags = (t_ne0 | (t_ne1 << 1) | (n_ne0 << 2) | (n_ne1 << 3))
    prefetch = jnp.stack([j0t, j0n, flags], axis=0)  # (3, num_tiles)

    def kernel(j_ref, s_ref, p_ref, mu_ref, nu_ref, tv0, tv1, tp0, tp1,
               nv0, nv1, np0, np1, po_ref, muo_ref, nuo_ref, g_ref):
        i = pl.program_id(0)
        lo = i * t
        fl = j_ref[2, i]
        lane = jax.lax.broadcasted_iota(jnp.int32, (wblk, 128), 1)
        g_ref[:] = jnp.zeros((t, 128), jnp.float32)

        def half(bit, v_ref, ph_ref):
            @pl.when((fl >> bit) % 2 == 1)
            def _():
                # phys rides the f32 buffer; values are exact ints < 2^24.
                # one-hot over OUTPUT ROWS via the lane axis: oh[e, row] = 1
                # iff the entry's physical row is this tile's row `row`;
                # entries outside [0, t) (neighbors, sentinels) match none.
                rel = ph_ref[:].astype(jnp.int32) - lo  # (wblk, 128)
                oh = jnp.where(rel == lane, 1.0, 0.0).astype(jnp.bfloat16)
                b1, b2, b3 = _split3(v_ref[:])
                dn = (((0,), (0,)), ((), ()))
                acc = g_ref[:]
                for bsplit in (b1, b2, b3):
                    acc += jax.lax.dot_general(
                        oh, bsplit, dn, preferred_element_type=jnp.float32)
                g_ref[:] = acc

        half(0, tv0, tp0)
        half(1, tv1, tp1)
        half(2, nv0, np0)
        half(3, nv1, np1)
        lr, wd, b1_, b2_, eps, bc1, bc2 = (s_ref[0, i_] for i_ in range(7))
        new_p, new_mu, new_nu = _adamw_math(
            p_ref[:], mu_ref[:], nu_ref[:], g_ref[:], lr, wd, b1_, b2_, eps,
            bc1, bc2)
        po_ref[:] = new_p
        muo_ref[:] = new_mu
        nuo_ref[:] = new_nu

    tile = lambda: pl.BlockSpec((t, 128), lambda i, j: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    win = lambda base, row: pl.BlockSpec(  # noqa: E731
        (wblk, 128), lambda i, j, base=base, row=row: (base + j[row, i], 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(),
                win(0, 0), win(1, 0),                        # target vals
                win(c_enc // wblk, 0), win(c_enc // wblk + 1, 0),  # t phys
                win(noise_v0, 1), win(noise_v0 + 1, 1),      # noise vals
                win(noise_p0, 1), win(noise_p0 + 1, 1),      # noise phys
            ],
            out_specs=[tile(), tile(), tile()],
            scratch_shapes=[pltpu.VMEM((t, 128), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((r, 128), jnp.float32)] * 3,
        input_output_aliases={2: 0, 3: 1, 4: 2},
        cost_estimate=pl.CostEstimate(
            flops=14 * r * 128 + 12 * 2 * wblk * 128 * r,
            bytes_accessed=4 * 128 * (6 * r + 8 * wblk * num_tiles),
            transcendentals=2 * r * 128,
        ),
        interpret=interpret,
    )(prefetch, scalars, p, mu, nu, *([enc] * 8))
