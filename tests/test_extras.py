"""Auxiliary layer inventory (reference layers.py leftovers, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.nn import extras

B, N, C, E = 3, 5, 2, 8


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def test_scaled_dot_product_attention():
    q = _x((B, N, E))
    ctx, probs = extras.scaled_dot_product_attention(q, q, q, scale=E ** 0.5)
    assert ctx.shape == (B, N, E)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_interhat_aggregation():
    m = extras.InterHAtAttentionalAggregation(embedding_dim=E)
    x = _x((B, N, E))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, E)


def test_interhat_mhsa_residual():
    m = extras.InterHAtMultiHeadSelfAttention(input_dim=E, num_heads=2)
    x = _x((B, N, E))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, N, E)


def test_interhat_ffn():
    m = extras.InterHAtFeedForward(input_dim=E)
    x = _x((B, N, E))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, N, E)


def test_pairwise_key_attention():
    m = extras.PairwiseKeyAttention(hidden_size=E, num_attn_heads=2)
    q = _x((B, N, E))
    k = _x((B, N, N, E), 1)
    out = m.apply(m.init(jax.random.PRNGKey(0), q, k), q, k)
    assert out.shape == (B, N, E)


@pytest.mark.parametrize("agg", ["sum", "mean", "attn"])
def test_product_layer(agg):
    m = extras.ProductLayer(num_fields=N, hidden_size=E, c_in=1, c_out=2,
                            agg_type=agg)
    x = _x((B, N, 1, E))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x)
    out = m.apply(variables, x)
    assert out.shape == (B, N, 2, E)


@pytest.mark.parametrize("red,expect_dim", [
    ("fc", 1), ("mean,fc", 1), ("sum,max,sum", 1), ("sum,sum,sum", 1),
    ("fc,max,avg", 1),
])
def test_multi_channel_output_head(red, expect_dim):
    m = extras.MultiChannelOutputHead(num_fields=N, num_channels=C,
                                      embed_size=E, output_reduction=red)
    x = _x((B, N, C, E))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape[0] == B
    assert out.reshape(B, -1).shape[1] == expect_dim
