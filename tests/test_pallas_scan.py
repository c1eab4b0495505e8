"""Pallas streaming block-cumsum (ops/pallas_scan) vs jnp.cumsum."""

import jax.numpy as jnp
import numpy as np

from map_tpu.ops.pallas_scan import block_cumsum


def test_block_cumsum_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    got = block_cumsum(x, interpret=True)
    want = jnp.cumsum(x, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_block_cumsum_fallback_shapes():
    rng = np.random.default_rng(1)
    for shape in ((100, 128), (1024, 33)):  # non-tile rows / non-128 lanes
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        np.testing.assert_allclose(np.asarray(block_cumsum(x)),
                                   np.asarray(jnp.cumsum(x, axis=0)),
                                   rtol=1e-5, atol=1e-4)


def test_fold_stream2_matches_separate_folds():
    from map_tpu.ops import dedup_scatter as ds

    rng = np.random.default_rng(2)
    n, e, cap = 4096, 32, 256
    ids = np.sort(rng.integers(0, 300, n)).astype(np.int32)
    gr = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
    gb = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    sids, order, u_of_orig, uids_c, start_pos, end_pos, valid, nu = \
        ds._sort_ids(jnp.asarray(ids), cap)
    ve2, vb2 = ds._fold_stream2(gr, gb, start_pos, end_pos, valid)
    ve = ds._fold_stream(gr, start_pos, end_pos, valid)
    vb = ds._fold_stream(gb, start_pos, end_pos, valid)
    np.testing.assert_allclose(np.asarray(ve2), np.asarray(ve),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vb2), np.asarray(vb),
                               rtol=1e-5, atol=1e-4)
