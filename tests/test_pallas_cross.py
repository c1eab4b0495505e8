"""Pallas cross-network kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu.ops.cross import cross_net_xla
from map_tpu.ops.pallas_cross import cross_net_pallas

B, D, L = 64, 128, 3


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(B, D)) * 0.3, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(D, D)) / np.sqrt(D), jnp.float32)
          for _ in range(L)]
    bs = [jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32) for _ in range(L)]
    return x0, ws, bs


def test_forward_matches_xla():
    x0, ws, bs = _inputs()
    ref = cross_net_xla(x0, ws, bs)
    out = cross_net_pallas(x0, ws, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_grads_match_xla():
    x0, ws, bs = _inputs(1)

    def loss_pallas(x0, ws, bs):
        return (cross_net_pallas(x0, ws, bs, interpret=True) ** 2).sum()

    def loss_xla(x0, ws, bs):
        return (cross_net_xla(x0, ws, bs) ** 2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x0, ws, bs)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x0, ws, bs)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_unaligned_batch_padding():
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(37, 130)) * 0.3, jnp.float32)  # odd shapes
    ws = [jnp.asarray(rng.normal(size=(130, 130)) / 12, jnp.float32)]
    bs = [jnp.zeros((130,), jnp.float32)]
    ref = cross_net_xla(x0, ws, bs)
    out = cross_net_pallas(x0, ws, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
