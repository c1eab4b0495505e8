"""Micro-benchmark: embedding gather variants on the real chip.

Compares XLA dynamic-gather (jnp.take) vs the Pallas DMA-gather kernel for
the canonical shapes (batch 4096 x 24 fields, 1M x 16 table), reporting
effective lookup GB/s. Run on hardware: python benchmarks/bench_lookup.py
"""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, iters=50):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # warm + materialize
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])  # host fetch barrier
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from map_tpu.ops.pallas_embedding import pallas_embedding_lookup

    v, e, b, f = 1_000_000, 16, 4096, 24
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    ids = jnp.asarray(rng.integers(10, v, (b, f)), jnp.int32)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt_xla = bench(take, table, ids)
    bytes_moved = b * f * e * 4
    print(f"xla take:      {dt_xla * 1e6:8.1f} us  {bytes_moved / dt_xla / 1e9:7.1f} GB/s")

    # NOTE: the per-row DMA gather kernel is latency-bound and loses badly to
    # XLA's native gather at E=16 (64-byte rows); measured on a small id count
    # only. It remains a tested demonstration of the scalar-prefetch DMA path.
    small = ids[:4, :]
    pk = jax.jit(lambda t, i: pallas_embedding_lookup(t, i, False))
    try:
        dt_pal = bench(pk, table, small, iters=5)
        small_bytes = small.size * e * 4
        print(f"pallas gather (96 rows): {dt_pal * 1e6:8.1f} us  "
              f"{small_bytes / dt_pal / 1e9:7.3f} GB/s")
    except Exception as ex:  # pragma: no cover
        print(f"pallas gather failed: {ex}")


if __name__ == "__main__":
    main()
