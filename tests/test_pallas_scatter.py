"""Pallas scatter-add kernel vs segment-sum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.ops.pallas_scatter import scatter_add


@pytest.mark.parametrize("v,e,n", [(2048, 16, 1000), (4096, 8, 4096)])
def test_matches_segment_sum(v, e, n):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, v, (n,)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(n, e)), jnp.float32)
    ref = jax.ops.segment_sum(g, ids, num_segments=v)
    out = scatter_add(ids, g, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_heavy_duplicates():
    """Unigram-skewed ids: many duplicates of a few hot rows."""
    rng = np.random.default_rng(1)
    hot = rng.integers(0, 50, 3000)          # hot block
    cold = rng.integers(50, 2048, 1000)
    ids = jnp.asarray(np.concatenate([hot, cold]), jnp.int32)
    g = jnp.asarray(rng.normal(size=(4000, 16)), jnp.float32)
    ref = jax.ops.segment_sum(g, ids, num_segments=2048)
    out = scatter_add(ids, g, 2048, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_multi_dim_inputs():
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 1024, (32, 8)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(32, 8, 16)), jnp.float32)
    ref = jax.ops.segment_sum(g.reshape(-1, 16), ids.reshape(-1),
                              num_segments=1024)
    out = scatter_add(ids, g, 1024, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_small_fallback():
    ids = jnp.asarray([1, 2, 2], jnp.int32)
    g = jnp.ones((3, 4), jnp.float32)
    out = scatter_add(ids, g, 10)
    assert float(out[2, 0]) == 2.0


def test_scatter_unique_sorted_matches_oracle():
    from map_tpu.ops.pallas_scatter import scatter_unique_sorted

    rng = np.random.default_rng(3)
    v, e, c = 4096, 16, 1024  # c = 2 tiles of 512
    nu = 700
    uids_np = np.sort(rng.choice(v, nu, replace=False)).astype(np.int32)
    uids = jnp.asarray(np.concatenate([uids_np,
                                       np.full(c - nu, v, np.int32)]))
    vals = jnp.asarray(rng.normal(size=(c, e)), jnp.float32)
    vals = vals.at[nu:].set(0.0)
    ref = jax.ops.segment_sum(vals[:nu], uids[:nu], num_segments=v)
    out = scatter_unique_sorted(uids, vals, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_scatter_unique_sorted_dense_window():
    """Every id of a contiguous block present: windows hit the 512 bound."""
    from map_tpu.ops.pallas_scatter import scatter_unique_sorted

    rng = np.random.default_rng(4)
    v, e, c = 2048, 8, 2048
    uids = jnp.arange(c, dtype=jnp.int32)  # ids 0..2047 all unique
    vals = jnp.asarray(rng.normal(size=(c, e)), jnp.float32)
    ref = jax.ops.segment_sum(vals, uids, num_segments=v)
    out = scatter_unique_sorted(uids, vals, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_scatter_unique_sorted_vocab_not_tile_multiple():
    from map_tpu.ops.pallas_scatter import scatter_unique_sorted

    rng = np.random.default_rng(5)
    v, e, c = 3000, 8, 1024  # v % 512 != 0; sentinel v falls in last tile range
    nu = 400
    uids_np = np.sort(rng.choice(v, nu, replace=False)).astype(np.int32)
    uids = jnp.asarray(np.concatenate([uids_np,
                                       np.full(c - nu, v, np.int32)]))
    vals = jnp.asarray(rng.normal(size=(c, e)), jnp.float32)
    ref = jax.ops.segment_sum(vals[:nu], uids[:nu], num_segments=v)
    out = scatter_unique_sorted(uids, vals, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
