"""Primitive costs for the sparse fused-AdamW design (ROADMAP round-3
item 2): the update stream must be sorted by physical row and its 128-lane
values permuted before a bounded-window table kernel can consume it. Those
two ops are the price of admission — if sort+permute cost more than the
~1.3 ms flat scatter they replace, the design is dead on arrival.

Measures, at the supervised-step scale (n = B*F = 98304 updates, table
R = 125440 x 128):
  1. lax.sort_key_val on n int32 keys + int32 payload
  2. 128-lane value permute: take(vals, perm) with a same-size source
  3. the flat scatter it would replace (reference point)
  4. sort + permute + segment-fold + windowed one-pass (XLA emulation)

Each op runs under lax.fori_loop with a data dependency so one dispatch
times 20 iterations (the tunnel costs ~1.2 ms per dispatch)."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 98304
R = 125440
W = 128
ITERS = 20


def bench(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)  # compile+barrier
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:7.3f} ms", flush=True)


def loop(body):
    def run(x, *rest):
        def it(i, carry):
            return body(i, carry, *rest)

        return jax.lax.fori_loop(0, ITERS, it, x)

    return run


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    def sort_body(i, acc, keys):
        k, v = jax.lax.sort_key_val(keys + i, jnp.arange(N, dtype=jnp.int32))
        return acc + k[0] + v[0]

    bench("sort_key_val 98k int32", loop(sort_body), jnp.int32(0), keys)

    def perm_body(i, acc, vals, perm):
        v = jnp.take(vals + jnp.float32(i), perm, axis=0)
        return acc + v[0, 0]

    bench("permute 98k x 128 f32", loop(perm_body), jnp.float32(0), vals, perm)

    def scatter_body(i, acc, keys, vals):
        out = jnp.zeros((R, W), jnp.float32).at[keys].add(vals + i)
        return acc + out[0, 0]

    bench("flat scatter 98k -> 125k x 128", loop(scatter_body),
          jnp.float32(0), keys, vals)

    def sorted_scatter_body(i, acc, skeys, vals):
        out = jnp.zeros((R, W), jnp.float32).at[skeys].add(
            vals + i, indices_are_sorted=True)
        return acc + out[0, 0]

    skeys = jnp.sort(keys)
    bench("flat scatter (sorted ids)", loop(sorted_scatter_body),
          jnp.float32(0), skeys, vals)

    # the full XLA-side prep chain the kernel needs: sort + permute + segment
    # boundaries + cumsum-fold to unique rows (capacity = N; no compaction)
    def prep_body(i, acc, keys, vals):
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, order = jax.lax.sort_key_val(keys + (i - i), iota)
        sv = jnp.take(vals + jnp.float32(i), order, axis=0)
        cs = jnp.cumsum(sv, axis=0)
        last = jnp.concatenate([sk[1:] != sk[:-1],
                                jnp.ones(1, jnp.bool_)])
        return acc + jnp.sum(jnp.where(last[:, None], cs, 0.0)[0])

    bench("sort+permute+cumsum fold", loop(prep_body), jnp.float32(0),
          keys, vals)


if __name__ == "__main__":
    main()
