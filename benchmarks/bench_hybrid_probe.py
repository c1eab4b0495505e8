"""Probe: field-blocked hybrid embedding access — do per-field SMALL-BLOCK
gathers/scatters (source/dest small enough to stay resident) or one-hot MXU
matmuls beat the flat whole-table gather/scatter for the small-vocab fields?

Context: the dataset id space is field-blocked (map_tpu/data/dataset.py
per-field contiguous ranges, reference data_preprocess/*). In Avazu/Criteo
most FIELDS have small vocabularies (<= a few thousand ids) while a few ID
fields (device_ip, device_id) hold most of the VOCAB. The per-row price of a
dynamic gather/scatter against the 1M-row table (~8/13 ns/row measured) is
latency against a 500 MB working set; rows from a field whose block is a few
hundred KB should be servable at near-VMEM speed — either by slicing the
block and gathering locally, or by a one-hot matmul on the MXU.

Run on the real chip: python benchmarks/bench_hybrid_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

V, E, PACK = 1_000_000, 16, 8
W = PACK * E  # 128-lane physical rows
B = 4096
STEPS = 30

# Avazu-x1-like field cardinalities (24 fields, ~1M total): a few huge ID
# fields, a tail of small categorical fields.
BIG_SIZES = [450_000, 350_000, 100_000, 40_000, 20_000]
SMALL_SIZES = [8000, 7000, 5000, 4000, 2500, 2000, 1500, 1200, 1000, 800,
               600, 500, 400, 300, 250, 100, 50, 24, 7]
RESERVED = 10


def _barrier(out):
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *args):
    out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    sizes = BIG_SIZES + SMALL_SIZES
    lows, lo = [], RESERVED
    for s in sizes:
        lows.append(lo)
        lo += s
    total = lo
    assert total <= V, total
    print(f"fields={len(sizes)} total_vocab={total}")

    rng = np.random.default_rng(0)
    ids = np.stack([rng.integers(lo, lo + s, B)
                    for lo, s in zip(lows, sizes)], axis=1).astype(np.int32)
    r = V // PACK  # 125000 physical rows (ignore ROW_ALIGN here)
    r = ((r + 511) // 512) * 512
    packed = jnp.asarray(rng.normal(size=(r, W)), jnp.float32)
    g_wide = jnp.asarray(rng.normal(size=(B, len(sizes), W)), jnp.float32)
    ids_d = jnp.asarray(ids)
    phys = ids_d // PACK

    big_f = [i for i, s in enumerate(sizes) if s > 16384]
    small_f = [i for i, s in enumerate(sizes) if s <= 16384]
    print(f"big fields={len(big_f)} small fields={len(small_f)} "
          f"small rows={len(small_f) * B}")

    # -- flat baselines ----------------------------------------------------
    @jax.jit
    def flat_gather(packed, phys):
        return jnp.take(packed, phys.reshape(-1), axis=0)

    @jax.jit
    def flat_scatter(phys, g):
        return jnp.zeros((r, W), jnp.float32).at[phys.reshape(-1)].add(
            g.reshape(-1, W))

    print(f"flat gather  98k rows: {timed(flat_gather, packed, phys):7.3f} ms")
    print(f"flat scatter 98k rows: {timed(flat_scatter, phys, g_wide):7.3f} ms")

    # -- big-only ----------------------------------------------------------
    phys_big = phys[:, big_f]
    g_big = g_wide[:, big_f]

    print(f"big-only gather  {len(big_f) * B} rows: "
          f"{timed(flat_gather, packed, phys_big):7.3f} ms")

    @jax.jit
    def big_scatter(phys_b, g):
        return jnp.zeros((r, W), jnp.float32).at[phys_b.reshape(-1)].add(
            g.reshape(-1, W))

    print(f"big-only scatter {len(big_f) * B} rows: "
          f"{timed(big_scatter, phys_big, g_big):7.3f} ms")

    # -- per-field small-block gather (sliced source) ----------------------
    blocks = []  # (f, plo, pe)
    for f in small_f:
        plo = lows[f] // PACK
        pe = (lows[f] + sizes[f] - 1) // PACK + 1
        blocks.append((f, plo, pe))

    @jax.jit
    def small_block_gather(packed, ids_d):
        outs = []
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            block = jax.lax.slice(packed, (plo, 0), (pe, W))
            outs.append(jnp.take(block, local, axis=0))
        return jnp.stack(outs, axis=1)

    print(f"small-block gather  {len(small_f) * B} rows: "
          f"{timed(small_block_gather, packed, ids_d):7.3f} ms")

    # -- per-field small-block scatter + dense slice-add -------------------
    @jax.jit
    def small_block_scatter(ids_d, g):
        dense = jnp.zeros((r, W), jnp.float32)
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            bg = jnp.zeros((pe - plo, W), jnp.float32).at[local].add(g[:, f])
            dense = jax.lax.dynamic_update_slice(
                dense, jax.lax.dynamic_slice(dense, (plo, 0),
                                             (pe - plo, W)) + bg, (plo, 0))
        return dense

    print(f"small-block scatter {len(small_f) * B} rows: "
          f"{timed(small_block_scatter, ids_d, g_wide):7.3f} ms")

    # -- per-field one-hot matmul (XLA) ------------------------------------
    @jax.jit
    def onehot_gather(packed, ids_d):
        outs = []
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            block = jax.lax.slice(packed, (plo, 0), (pe, W))
            oh = (local[:, None] ==
                  jnp.arange(pe - plo, dtype=jnp.int32)[None, :])
            outs.append(jnp.dot(oh.astype(jnp.bfloat16),
                                block.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
        return jnp.stack(outs, axis=1)

    print(f"onehot-mm gather  (bf16) {len(small_f) * B} rows: "
          f"{timed(onehot_gather, packed, ids_d):7.3f} ms")

    @jax.jit
    def onehot_scatter(ids_d, g):
        dense = jnp.zeros((r, W), jnp.float32)
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            oh = (local[:, None] ==
                  jnp.arange(pe - plo, dtype=jnp.int32)[None, :])
            bg = jnp.dot(oh.astype(jnp.bfloat16).T,
                         g[:, f].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            dense = jax.lax.dynamic_update_slice(
                dense, jax.lax.dynamic_slice(dense, (plo, 0),
                                             (pe - plo, W)) + bg, (plo, 0))
        return dense

    print(f"onehot-mm scatter (bf16) {len(small_f) * B} rows: "
          f"{timed(onehot_scatter, ids_d, g_wide):7.3f} ms")

    # -- combined hybrid (gather side): big flat + small blocks ------------
    @jax.jit
    def hybrid_gather(packed, ids_d):
        rows_big = jnp.take(packed, (ids_d[:, big_f] // PACK).reshape(-1),
                            axis=0).reshape(B, len(big_f), W)
        outs = []
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            block = jax.lax.slice(packed, (plo, 0), (pe, W))
            outs.append(jnp.take(block, local, axis=0))
        rows_small = jnp.stack(outs, axis=1)
        return rows_big, rows_small

    print(f"hybrid gather 98k rows: "
          f"{timed(hybrid_gather, packed, ids_d):7.3f} ms")

    # -- combined hybrid scatter -------------------------------------------
    @jax.jit
    def hybrid_scatter(ids_d, g):
        dense = jnp.zeros((r, W), jnp.float32).at[
            (ids_d[:, big_f] // PACK).reshape(-1)].add(
            g[:, big_f].reshape(-1, W))
        for f, plo, pe in blocks:
            local = ids_d[:, f] // PACK - plo
            bg = jnp.zeros((pe - plo, W), jnp.float32).at[local].add(g[:, f])
            dense = jax.lax.dynamic_update_slice(
                dense, jax.lax.dynamic_slice(dense, (plo, 0),
                                             (pe - plo, W)) + bg, (plo, 0))
        return dense

    print(f"hybrid scatter 98k rows: "
          f"{timed(hybrid_scatter, ids_d, g_wide):7.3f} ms")


if __name__ == "__main__":
    main()
