"""shard_map row-sharded lookup vs the dense gather oracle (SURVEY.md §4 tier 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu.parallel.embedding import sharded_embedding_lookup
from map_tpu.parallel.mesh import build_mesh
from map_tpu.parallel.sharding import shard_batch
from jax.sharding import NamedSharding, PartitionSpec as P

V, E, B, F = 512, 16, 32, 6


def _data(seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, E)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (B, F)), jnp.int32)
    return table, ids


def test_lookup_matches_dense_gather():
    table, ids = _data()
    oracle = np.asarray(jnp.take(table, ids, axis=0))
    mesh = build_mesh(2, 4)
    table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    out = sharded_embedding_lookup(table_s, ids_s, mesh)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-6)


def test_lookup_gradient_is_scatter_add():
    """d/dtable of sum(lookup * g) == segment-sum of g at the looked-up rows."""
    table, ids = _data(1)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(B, F, E)), jnp.float32)
    mesh = build_mesh(2, 4)
    table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", None)))

    def loss_sharded(t):
        return jnp.sum(sharded_embedding_lookup(t, ids_s, mesh) * g)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * g)

    g_sharded = np.asarray(jax.grad(loss_sharded)(table_s))
    g_dense = np.asarray(jax.grad(loss_dense)(table))
    np.testing.assert_allclose(g_sharded, g_dense, rtol=1e-5, atol=1e-6)


def test_single_shard_fast_path():
    table, ids = _data(3)
    mesh = build_mesh(8, 1)
    out = sharded_embedding_lookup(table, ids, mesh)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)))
