"""Probe: does lane-packing (V, 16) tables into (V/8, 128) speed up the
dense AdamW-style table update, the gather, and the scatter-add on TPU?

Hypothesis: XLA:TPU stores arrays in (8, 128) tiles, so a (1M, 16) f32 table
physically occupies 1M x 128 floats of HBM (8x logical bytes); every dense
pass over it (the AdamW update that parity-required weight decay forces each
step) pays 8x the bandwidth. Packing 8 logical rows per physical 128-lane row
should recover that. Gathers are per-row-priced (latency-bound), so the wider
packed rows should cost the same.

Run on the real chip: python benchmarks/bench_packed_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

V, E, PACK = 1_000_000, 16, 8
N_IDS = 98_304  # canonical batch 4096 x 24 fields
STEPS = 30


def _barrier(out):
    # host fetch barrier (block_until_ready returns early through the tunnel);
    # fetch a device-computed SCALAR — element-indexing a big device array
    # pulls the whole buffer through the tunnel
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *args):
    out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / STEPS * 1e3


def adamw_like(p, m, v, g):
    m = 0.9 * m + 0.1 * g
    v = 0.999 * v + 0.001 * g * g
    p = p - 1e-3 * (m / (jnp.sqrt(v) + 1e-8) + 0.1 * p)
    return p, m, v


def main():
    import functools, sys
    global print
    print = functools.partial(print, flush=True)
    key = jax.random.PRNGKey(0)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, V, N_IDS), jnp.int32)

    for shape, tag in (((V, E), "flat (1M,16)"),
                       ((V // PACK, E * PACK), "packed (125k,128)")):
        p = jax.random.normal(key, shape, jnp.float32)
        m = jnp.zeros(shape, jnp.float32)
        v = jnp.ones(shape, jnp.float32)
        g = jax.random.normal(key, shape, jnp.float32) * 1e-3

        upd = jax.jit(adamw_like)
        ms = timed(upd, p, m, v, g)
        print(f"adamw update  {tag:20s}: {ms:7.3f} ms")

        table = jax.random.normal(key, shape, jnp.float32)
        if shape[1] == E:
            gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            gids = ids
        else:
            def gather(t, i):
                rows = jnp.take(t, i // PACK, axis=0)  # (N, 128)
                sub = jax.nn.one_hot(i % PACK, PACK, dtype=t.dtype)  # (N, 8)
                return jnp.einsum("np,npe->ne", sub,
                                  rows.reshape(-1, PACK, E))
            gather = jax.jit(gather)
            gids = ids
        ms = timed(gather, table, gids)
        print(f"gather 98k    {tag:20s}: {ms:7.3f} ms")

        gout = jax.random.normal(key, (N_IDS, E), jnp.float32)
        if shape[1] == E:
            scatter = jax.jit(lambda i, go: jnp.zeros(shape, jnp.float32)
                              .at[i].add(go))
        else:
            def scatter(i, go):
                sub = jax.nn.one_hot(i % PACK, PACK, dtype=go.dtype)
                wide = (sub[:, :, None] * go[:, None, :]).reshape(-1, PACK * E)
                return jnp.zeros(shape, jnp.float32).at[i // PACK].add(wide)
            scatter = jax.jit(scatter)
        ms = timed(scatter, ids, gout)
        print(f"scatter 98k   {tag:20s}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
