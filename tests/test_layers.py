"""Layer numerics against closed-form / naive references (SURVEY.md §4 tier 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.nn import layers as L
from map_tpu.nn.activations import get_act


def test_cross_net_matches_manual_loop():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    m = L.CrossNetV2(num_cross_layers=3)
    params = m.init(jax.random.PRNGKey(0), x0)
    out = np.asarray(m.apply(params, x0))
    xi = np.asarray(x0, np.float64)
    x0n = np.asarray(x0, np.float64)
    for i in range(3):
        w = np.asarray(params["params"][f"kernel_{i}"], np.float64)
        b = np.asarray(params["params"][f"bias_{i}"], np.float64)
        xi = xi + x0n * (xi @ w + b)  # layers.py:197-201
    np.testing.assert_allclose(out, xi, rtol=1e-4, atol=1e-5)


def test_inner_product_sum_equals_pairwise():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32)
    m = L.InnerProductLayer(num_fields=6, output="product_sum")
    out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), x), x))
    xn = np.asarray(x, np.float64)
    ref = np.zeros((4, 1))
    for i in range(6):
        for j in range(i + 1, 6):
            ref[:, 0] += (xn[:, i] * xn[:, j]).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_inner_product_pairs_order():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    m = L.InnerProductLayer(num_fields=4, output="inner_product")
    out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), x), x))
    assert out.shape == (2, 6)
    xn = np.asarray(x)
    k = 0
    for i in range(4):
        for j in range(i + 1, 4):
            np.testing.assert_allclose(out[:, k], (xn[:, i] * xn[:, j]).sum(-1),
                                       rtol=1e-4)
            k += 1


def test_cin_matches_naive():
    rng = np.random.default_rng(3)
    f, e, units = 5, 4, (6, 3)
    x0 = jnp.asarray(rng.normal(size=(2, f, e)), jnp.float32)
    m = L.CIN(num_fields=f, cin_layer_units=units)
    params = m.init(jax.random.PRNGKey(0), x0)
    out = np.asarray(m.apply(params, x0))
    # naive per layers.py:708-721
    x0n = np.asarray(x0, np.float64)
    xi = x0n
    pooled = []
    for li, unit in enumerate(units):
        had = np.einsum("bhd,bmd->bhmd", x0n, xi).reshape(2, -1, e)
        w = np.asarray(params["params"][f"kernel_{li}"], np.float64)
        b = np.asarray(params["params"][f"bias_{li}"], np.float64)
        xi = np.einsum("bie,io->boe", had, w) + b[None, :, None]
        pooled.append(xi.sum(-1))
    ref = np.concatenate(pooled, axis=-1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_activations_closed_form():
    x = jnp.linspace(-3, 3, 61)
    xn = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(get_act("relu")(x)), np.maximum(xn, 0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(get_act("swish")(x)),
                               xn / (1 + np.exp(-xn)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(get_act("mish")(x)),
                               xn * np.tanh(np.log1p(np.exp(xn))), atol=1e-5)
    # LEU: alpha*log(x+1) for x>0 else alpha*(exp(x)-1) (layers.py:22-27)
    leu_ref = np.where(xn > 0, np.log(xn + 1), np.exp(np.minimum(xn, 0)) - 1)
    np.testing.assert_allclose(np.asarray(get_act("leu")(x)), leu_ref, atol=1e-5)
    from scipy.special import erf
    gelu_ref = xn * 0.5 * (1 + erf(xn / np.sqrt(2)))
    np.testing.assert_allclose(np.asarray(get_act("gelu")(x)), gelu_ref, atol=1e-5)


def test_embedding_init_std():
    m = L.Embeddings(input_size=5000, embed_size=16, num_fields=24)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 24), jnp.int32))
    table = np.asarray(params["params"]["embedding"])
    want_std = np.sqrt(2.0 / (24 + 16))  # layers.py:87-91
    assert abs(table.std() - want_std) / want_std < 0.05


def test_fignn_graph_no_self_loops():
    rng = np.random.default_rng(4)
    f, e = 5, 8
    x = jnp.asarray(rng.normal(size=(3, f, e)), jnp.float32)
    m = L.FiGNNBlock(num_fields=f, embed_size=e, gnn_layers=2)
    params = m.init(jax.random.PRNGKey(0), x)
    g = m.apply(params, x, method=m.build_graph_with_attention)
    gn = np.asarray(g)
    assert np.allclose(np.diagonal(gn, axis1=1, axis2=2), 0.0)  # masked -inf
    np.testing.assert_allclose(gn.sum(-1), 1.0, atol=1e-5)  # softmax rows


def test_squeeze_excite_shapes():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 6, 8)), jnp.float32)
    m = L.SqueezeExtractionLayer(num_fields=6, reduction_ratio=3)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == x.shape


def test_bilinear_variants():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 4, 5)), jnp.float32)
    for bt in ("field_all", "field_each", "field_interaction"):
        m = L.BilinearInteractionLayer(num_fields=4, embed_size=5, bilinear_type=bt)
        out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 6, 5)


def test_transformer_encoder_layer_shapes():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    for norm_first in (False, True):
        m = L.TransformerEncoderLayer(d_model=16, nhead=2, dim_feedforward=32,
                                      norm_first=norm_first)
        out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == x.shape
