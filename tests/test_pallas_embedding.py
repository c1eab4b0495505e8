"""Pallas DMA-gather kernel vs jnp.take oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu.ops.pallas_embedding import pallas_embedding_lookup


def test_gather_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(1000, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1000, (32, 24)), jnp.int32)
    out = pallas_embedding_lookup(table, ids, True)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_gather_unaligned_count():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(97, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 97, (13,)), jnp.int32)
    out = pallas_embedding_lookup(table, ids, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)))


def test_gather_grad_is_scatter_add():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 50, (8, 3)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(8, 3, 4)), jnp.float32)

    def loss_pallas(t):
        return jnp.sum(pallas_embedding_lookup(t, ids, True) * g)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * g)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_pallas)(table)),
                               np.asarray(jax.grad(loss_ref)(table)),
                               rtol=1e-5, atol=1e-6)
