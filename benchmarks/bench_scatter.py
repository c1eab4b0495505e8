"""Scatter-add gradient strategies for the embedding table (the step-time
bottleneck: XLA's default scatter serializes). Variants:
  a) plain .at[ids].add
  b) sort-by-id then scatter with indices_are_sorted
  c) segment_sum (sorted)
  d) sort + unique-flags scatter
Run on hardware."""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

V, E, B, F = 1_000_000, 16, 4096, 24
N = B * F


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, V, (N,)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, E)), jnp.float32)

    def plain(ids, g):
        return jnp.zeros((V, E), jnp.float32).at[ids].add(g).sum()

    def sorted_scatter(ids, g):
        order = jnp.argsort(ids)
        ids_s = ids[order]
        g_s = g[order]
        return jnp.zeros((V, E), jnp.float32).at[ids_s].add(
            g_s, indices_are_sorted=True).sum()

    def seg_sum(ids, g):
        order = jnp.argsort(ids)
        return jax.ops.segment_sum(g[order], ids[order], num_segments=V,
                                   indices_are_sorted=True).sum()

    def seg_sum_unsorted(ids, g):
        return jax.ops.segment_sum(g, ids, num_segments=V).sum()

    from map_tpu.ops.pallas_scatter import scatter_add

    def pallas(ids, g):
        return scatter_add(ids, g, V).sum()

    # correctness on hardware first
    ref = np.asarray(jax.jit(lambda i, x: jnp.zeros((V, E), jnp.float32)
                             .at[i].add(x))(ids, g))
    out = np.asarray(jax.jit(lambda i, x: scatter_add(i, x, V))(ids, g))
    err = np.abs(ref - out).max()
    print(f"pallas max |err| vs scatter: {err:.2e}")

    def sort_only(ids, g):
        order = jnp.argsort(ids)
        return ids[order].sum() + g[order].sum()

    for name, fn in [("plain scatter", plain),
                     ("sorted scatter", sorted_scatter),
                     ("segsum sorted", seg_sum),
                     ("segsum plain", seg_sum_unsorted),
                     ("sort only", sort_only),
                     ("pallas tiles", pallas)]:
        dt = timeit(jax.jit(fn), ids, g)
        print(f"{name:16s} {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
