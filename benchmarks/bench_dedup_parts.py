"""Micro-bench of the dedup-scatter building blocks on hardware (take 4).

Measures argsort / gather / cumsum / searchsorted / scatter at the MFP
candidate scale (745k rows x 32) to validate the sorted-unique scatter design
(ROADMAP round-2 item 1) before wiring it in.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # tunnel-safe barrier: fetch a value
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    n, e, v = 745_472, 32, 1_000_000
    rng = np.random.default_rng(0)
    # zipf-ish skewed ids (realistic CTR unigram) and uniform ids (worst case)
    zipf = rng.zipf(1.3, size=n).astype(np.int64) % v
    uni = rng.integers(0, v, n)
    g = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)

    for name, ids_np in (("zipf", zipf), ("uniform", uni)):
        ids = jnp.asarray(ids_np, jnp.int32)
        print(f"--- ids: {name} (unique={len(np.unique(ids_np))}) ---")
        timeit("argsort(n)", jax.jit(jnp.argsort), ids)
        order = jnp.argsort(ids)
        timeit("sort_key_val(ids, iota)",
               jax.jit(lambda i: jax.lax.sort_key_val(
                   i, jnp.arange(n, dtype=jnp.int32))), ids)
        timeit("gather perm (n,e)", jax.jit(lambda gg, o: gg[o]), g, order)
        sids = ids[order]
        sg = g[order]
        timeit("cumsum (n,e)", jax.jit(lambda x: jnp.cumsum(x, axis=0)), sg)
        first = jnp.concatenate([jnp.ones(1, jnp.int32),
                                 (sids[1:] != sids[:-1]).astype(jnp.int32)])
        cumf = jnp.cumsum(first)
        jq = jnp.arange(n, dtype=jnp.int32)
        timeit("searchsorted (n over n)",
               jax.jit(lambda c, q: jnp.searchsorted(c, q)), cumf, jq)
        timeit("scatter-add full n", jax.jit(
            lambda i, gg: jnp.zeros((v, e), jnp.float32).at[i].add(gg)),
            sids, sg)
        u = int(cumf[-1])
        uid = jnp.asarray(np.sort(rng.choice(v, u, replace=False)), jnp.int32)
        ug = jnp.asarray(rng.standard_normal((u, e)), jnp.float32)
        timeit(f"scatter-add unique u={u}", jax.jit(
            lambda i, gg: jnp.zeros((v, e), jnp.float32).at[i].add(gg)),
            uid, ug)
        timeit(f"scatter-add unique(sorted,flagged) u={u}", jax.jit(
            lambda i, gg: jnp.zeros((v, e), jnp.float32).at[i].add(
                gg, unique_indices=True, indices_are_sorted=True)),
            uid, ug)




def scatter_variants():
    """Width/capacity variants for the decoder backward scatter."""
    v = 1_000_000
    rng = np.random.default_rng(0)
    for u in (32768, 49152, 65536, 131072):
        uid = jnp.asarray(np.sort(rng.choice(v, u, replace=False)), jnp.int32)
        for e in (1, 32, 33):
            ug = jnp.asarray(rng.standard_normal((u, e)), jnp.float32)
            timeit(f"scatter u={u} e={e}", jax.jit(
                lambda i, gg, e=e: jnp.zeros((v, e), jnp.float32).at[i].add(
                    gg, unique_indices=True, indices_are_sorted=True)),
                uid, ug)
    n = 745_472
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    bias = jnp.asarray(rng.standard_normal(v), jnp.float32)
    timeit("gather 745k 1-wide (bias)", jax.jit(lambda b, i: b[i]), bias, ids)
    tab = jnp.asarray(rng.standard_normal((v, 32)), jnp.float32)
    timeit("gather 745k 32-wide direct", jax.jit(lambda t, i: t[i]), tab, ids)
    small = jnp.asarray(rng.standard_normal((131072, 32)), jnp.float32)
    sid = jnp.asarray(rng.integers(0, 131072, n), jnp.int32)
    timeit("gather 745k 32-wide small-src", jax.jit(lambda t, i: t[i]), small, sid)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "scatter":
        scatter_variants()
        raise SystemExit
    main()
