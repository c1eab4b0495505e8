"""Interpret-mode oracles for the single-op field-block Pallas kernels."""

import jax.numpy as jnp
import numpy as np

from map_tpu.ops.pallas_field_gather import (
    TILE,
    assemble_dense,
    field_block_gather,
    field_block_scatter,
    plan_pairs,
)

R, W, B = 4096, 128, 256


def _case(seed=0):
    rng = np.random.default_rng(seed)
    packed = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)
    # windows: two fields in one tile, one spanning tiles, one at the tail
    small = ((0, 10, 40), (1, 40, 300), (2, 600, 1400), (3, 3900, R))
    phys = np.stack([rng.integers(plo, pe, B)
                     for _, plo, pe in small]).astype(np.int32)
    # sprinkle -1 (skip) rows
    mask = rng.random(phys.shape) < 0.1
    phys[mask] = -1
    return packed, small, phys


def test_gather_exact():
    packed, small, phys = _case()
    got = field_block_gather(packed, jnp.asarray(phys), small, R,
                             interpret=True)
    got = np.asarray(got).reshape(B, len(small), W)
    for pos in range(len(small)):
        want = np.where((phys[pos] >= 0)[:, None],
                        np.asarray(packed)[np.maximum(phys[pos], 0)], 0.0)
        np.testing.assert_array_equal(got[:, pos], want)


def test_scatter_matches_segment_sum():
    packed, small, phys = _case(1)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(B, len(small) * W)), jnp.float32)
    stack = field_block_scatter(g, jnp.asarray(phys), small, R,
                                interpret=True)
    dense = np.asarray(assemble_dense(stack, plan_pairs(small, R)[0], R))
    want = np.zeros((R, W), np.float32)
    g3 = np.asarray(g).reshape(B, len(small), W)
    for pos in range(len(small)):
        for b in range(B):
            if phys[pos, b] >= 0:
                want[phys[pos, b]] += g3[b, pos]
    np.testing.assert_allclose(dense, want, rtol=1e-6, atol=1e-5)


def test_plan_pairs_dedup_and_alignment():
    small = ((0, 10, 40), (1, 40, 300), (2, 600, 1400))
    utiles, pairs = plan_pairs(small, R)
    assert utiles == (0, 1, 2)
    assert all(t * TILE + TILE <= R for t in utiles)
    # fields 0 and 1 share tile 0; field 2 spans tiles 1 and 2
    assert [(p, s) for p, s, _ in pairs] == [(0, 0), (1, 0), (2, 1), (2, 2)]
