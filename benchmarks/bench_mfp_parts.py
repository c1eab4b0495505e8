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


if __name__ == "__main__":
    main()
