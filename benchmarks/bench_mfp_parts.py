"""Per-op costs at the MFP per-position scale (n = B*M*(1+k) = 745k), to
drive the round-3 sorted-order NCE redesign (ROADMAP item 1).

The dedup pipeline (ops/dedup_scatter.py) runs THREE full-stream sorts:
  sort1: ids ascending (required — the folded scatter needs sorted order)
  sort2: compact segment starts to the front
  sort3: invert the permutation (u_of_orig for the original-order expand)
sort2 and sort3 are both pure PERMUTATION computations, so each can be
replaced by one 1-wide unique-index .set scatter IF that scatter is cheap
(inv[order] = iota). XLA serializes ADD scatters; whether unique SET
scatters behave better at 1 lane is exactly what this measures.

All ops fori_loop-amortized over 10 iters in one dispatch (the tunnel costs
~1.2 ms per dispatch)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 745_472
E = 32
V = 1_000_000
C = 131_072
ITERS = 10


def bench(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {dt * 1e3:8.3f} ms", flush=True)


def loop(body):
    def run(x, *rest):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: body(i, c, *rest), x)

    return run


def main():
    rng = np.random.default_rng(0)
    zipf = (rng.zipf(1.3, size=N).astype(np.int64) % V).astype(np.int32)
    ids = jnp.asarray(zipf)
    iota = jnp.arange(N, dtype=jnp.int32)
    order = jnp.asarray(rng.permutation(N), jnp.int32)
    g32 = jnp.asarray(rng.standard_normal((N, E)), jnp.float32)
    g1 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    compact = jnp.asarray(rng.standard_normal((C, E)), jnp.float32)
    seg = jnp.sort(jnp.asarray(rng.integers(0, C, N), jnp.int32))
    tab4 = jnp.asarray(rng.standard_normal((V, 4)), jnp.float32)
    draws = jnp.asarray(rng.integers(0, V, N), jnp.int32)

    bench("sort_key_val 745k int32+payload",
          loop(lambda i, a, ids: a + jax.lax.sort_key_val(
              ids + i, iota)[0][0]), jnp.int32(0), ids)

    bench("inv-perm via 1-wide unique SET scatter",
          loop(lambda i, a, order: a + jnp.zeros(N, jnp.int32).at[order].set(
              iota + i, unique_indices=True)[0]), jnp.int32(0), order)

    bench("perm gather 745k x 32 (big->big src)",
          loop(lambda i, a, g, o: a + jnp.take(
              g + jnp.float32(i), o, axis=0)[0, 0]),
          jnp.float32(0), g32, order)

    bench("perm gather 745k x 1",
          loop(lambda i, a, g, o: a + jnp.take(g + jnp.float32(i), o)[0]),
          jnp.float32(0), g1, order)

    bench("expand gather 745k x 32 from 131k src",
          loop(lambda i, a, c, s: a + jnp.take(
              c + jnp.float32(i), s, axis=0)[0, 0]),
          jnp.float32(0), compact, seg)

    bench("alias fused-tab gather 745k x 4 from 1M",
          loop(lambda i, a, t, d: a + jnp.take(
              t + jnp.float32(i), d, axis=0)[0, 0]),
          jnp.float32(0), tab4, draws)

    bench("cumsum 745k x 33",
          loop(lambda i, a, g: a + jnp.cumsum(
              jnp.concatenate([g + jnp.float32(i), g[:, :1]], axis=1),
              axis=0)[-1, 0]),
          jnp.float32(0), g32)

    # h-payload gather at sorted-order-design scale: 745k rows from the
    # SMALL (28672, 32) per-position source
    h = jnp.asarray(rng.standard_normal((28_672, E)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 28_672, N), jnp.int32)
    bench("h gather 745k x 32 from 28k src",
          loop(lambda i, a, h, p: a + jnp.take(
              h + jnp.float32(i), p, axis=0)[0, 0]),
          jnp.float32(0), h, pos)

    # the forward bias expand: 1-wide take from the 131k compact source
    cb = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bench("bias expand 745k x 1 from 131k src",
          loop(lambda i, a, cb, s: a + jnp.take(cb + jnp.float32(i), s)[0]),
          jnp.float32(0), cb, seg)

    # the round-3 lane-select backward: 26-lane row gather from the small
    # (28k, 26) source + VPU select (replaces the 1-wide 7.8 ms permute)
    g26 = jnp.asarray(rng.standard_normal((28_672, 26)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, 26, N), jnp.int32)

    def lane_sel(i, a, g26, pos, slot):
        from map_tpu.ops.packed_table import select_sub_block

        rows = jnp.take(g26 + jnp.float32(i), pos, axis=0)
        return a + select_sub_block(rows, slot, 1)[0, 0]

    bench("26-lane gather + lane select (new bwd)",
          loop(lane_sel), jnp.float32(0), g26, pos, slot)

    # cumsum alternative: two-level blocked (within-block + carry)
    def cs2(i, a, g):
        x = (g + jnp.float32(i)).reshape(1456, 512, E)
        within = jnp.cumsum(x, axis=1)
        carries = jnp.concatenate(
            [jnp.zeros((1, E), jnp.float32),
             jnp.cumsum(within[:, -1, :], axis=0)[:-1]], axis=0)
        return a + (within + carries[:, None, :]).reshape(-1, E)[-1, 0]

    bench("cumsum 745k x 32 two-level blocked", loop(cs2),
          jnp.float32(0), g32)

    bench("cumsum 745k x 32 plain",
          loop(lambda i, a, g: a + jnp.cumsum(
              g + jnp.float32(i), axis=0)[-1, 0]),
          jnp.float32(0), g32)

    # bias expand through a 32-lane broadcast source (the production fix:
    # 1-wide gathers are per-row priced ~2x a 32-wide)
    def bias_wide(i, a, cb, s):
        cbw = jax.lax.optimization_barrier(
            jnp.broadcast_to((cb + jnp.float32(i))[:, None], (C, 32)))
        return a + jnp.take(cbw, s, axis=0)[0, 0]

    bench("bias expand via 32-lane broadcast", loop(bias_wide),
          jnp.float32(0), cb, seg)

    # packed-3 merged expand: rows+bias packed 3 logical 33-float rows per
    # 128-lane physical row; ONE gather + 3-way lane select
    merged = jnp.concatenate([compact, cb[:, None]], axis=1)      # (C, 33)
    c3 = -(-C // 3)
    merged3 = jnp.concatenate(
        [merged, jnp.zeros((c3 * 3 - C, 33), jnp.float32)]).reshape(c3, 99)
    merged3 = jnp.pad(merged3, ((0, 0), (0, 29)))                 # (C/3, 128)

    def packed3(i, a, m3, s):
        wide = jax.lax.optimization_barrier(
            jnp.take(m3 + jnp.float32(i), s // 3, axis=0))        # (n, 128)
        slot = (s % 3)[:, None]
        out = None
        for j in range(3):
            term = jnp.where(slot == j, wide[:, 33 * j:33 * j + 33], 0.0)
            out = term if out is None else out + term
        return a + out[0, 0] + out[0, 32]

    bench("packed3 merged expand (rows+bias)", loop(packed3),
          jnp.float32(0), merged3, seg)

    # fused backward gather: [h(32) | score_row(26) | pad] as ONE 64-lane
    # take from the small (B*M, 64) source, h from lanes :32, d_score by a
    # SCALAR-lane select (26 terms x (n,) slices = 78 MB total — no 381 MB
    # wide-slice trap). Candidate replacement for h-gather (4.0 ms) +
    # 1-wide d_score permute (7.9 ms) in _dsp_bwd.
    hg = jnp.asarray(rng.standard_normal((28_672, 64)), jnp.float32)

    def fused_hs(i, a, hg, pos, slot):
        wide = jnp.take(hg + jnp.float32(i), pos, axis=0)          # (n, 64)
        wide = jax.lax.optimization_barrier(wide)
        h_sorted = wide[:, :32]
        d = None
        for s in range(26):
            term = jnp.where(slot == s, wide[:, 32 + s], 0.0)
            d = term if d is None else d + term
        return a + h_sorted[0, 0] + d[0]

    bench("fused h+score 64-lane gather+scalar sel", loop(fused_hs),
          jnp.float32(0), hg, pos, slot)

    # d_score via a 32-LANE-PADDED score-row gather + scalar-lane select:
    # (B*M, 26) padded to (B*M, 32) — a clean 128-byte row (the 26-lane
    # layout was pathological, the 64-lane row crossed the access-size
    # cliff) — then 26 scalar-lane terms, each reading ONE (n,) lane slice.
    g26p = jnp.pad(g26, ((0, 0), (0, 6)))

    def pad32_sel(i, a, gp, pos, slot):
        wide = jnp.take(gp + jnp.float32(i), pos, axis=0)          # (n, 32)
        wide = jax.lax.optimization_barrier(wide)
        d = None
        for s in range(26):
            term = jnp.where(slot == s, wide[:, s], 0.0)
            d = term if d is None else d + term
        return a + d[0]

    bench("d_score via padded-32 gather+scalar sel", loop(pad32_sel),
          jnp.float32(0), g26p, pos, slot)


if __name__ == "__main__":
    main()
