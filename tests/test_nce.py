"""NCE subsystem numerics (reference `code/nce/nce_loss.py`, `index_linear.py`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import base_model_config
from map_tpu.objectives.alias import noise_distribution
from map_tpu.objectives.nce import (
    IndexLinearDecoder,
    bce_with_logits,
    full_ce_loss,
    mfp_accuracy_count,
    nce_loss,
    sampled_softmax_loss,
)

V, E, B, M, K = 50, 8, 4, 3, 5


def _cfg():
    rng = np.random.default_rng(0)
    probs = noise_distribution(rng.random(V) + 0.1)
    cfg = base_model_config(input_size=V, proj_size=E)
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(V))
    return cfg, probs


def test_bce_with_logits_matches_definition():
    rng = np.random.default_rng(0)
    x = rng.normal(size=100).astype(np.float32) * 5
    y = rng.integers(0, 2, 100).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    p = 1 / (1 + np.exp(-x.astype(np.float64)))
    ref = -(y * np.log(p) + (1 - y) * np.log(1 - p))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_decoder_bias_init_is_unigram_prior():
    cfg, probs = _cfg()
    dec = IndexLinearDecoder(V, E, cfg)
    idx = jnp.zeros((B, M, 1 + K), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((B, M, E)), idx)
    bias = np.asarray(params["params"]["bias"])
    # index_linear.py:41-48: bias = logprob_noise + norm_term
    np.testing.assert_allclose(bias, np.log(probs) + math.log(V),
                               rtol=1e-5, atol=1e-5)


def test_decoder_logits_match_manual():
    cfg, _ = _cfg()
    dec = IndexLinearDecoder(V, E, cfg)
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(rng.normal(size=(B, M, E)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (B, M, 1 + K)), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), inputs, idx)
    logits = np.asarray(dec.apply(params, inputs, idx))
    emb = np.asarray(params["params"]["emb"])
    bias = np.asarray(params["params"]["bias"])
    for b in range(B):
        for m in range(M):
            for c in range(1 + K):
                want = inputs[b, m] @ emb[idx[b, m, c]] + bias[idx[b, m, c]]
                assert abs(logits[b, m, c] - want) < 1e-4


def test_nce_loss_matches_manual_formula():
    """nce mode = sum over candidates of BCE(logit_model - logit_noise - log k)
    with label 1 at slot 0 (nce_loss.py:215-230)."""
    cfg, probs = _cfg()
    rng = np.random.default_rng(2)
    model_logits = jnp.asarray(rng.normal(size=(B, M, 1 + K)), jnp.float32)
    cand = rng.integers(0, V, (B, M, 1 + K))
    noise_lp = jnp.asarray(np.log(probs)[cand], jnp.float32)
    loss = np.asarray(nce_loss(model_logits, noise_lp, cfg.norm_term, K))
    # manual
    lt = np.asarray(model_logits) - cfg.norm_term - np.asarray(noise_lp) - math.log(K)
    lbl = np.zeros_like(lt)
    lbl[:, :, 0] = 1
    p = 1 / (1 + np.exp(-lt.astype(np.float64)))
    ref = -(lbl * np.log(p) + (1 - lbl) * np.log(1 - p)).sum(axis=2)
    np.testing.assert_allclose(loss, ref, rtol=1e-4, atol=1e-5)


def test_sampled_softmax_is_q_corrected_ce():
    cfg, probs = _cfg()
    rng = np.random.default_rng(3)
    model_logits = jnp.asarray(rng.normal(size=(B, M, 1 + K)), jnp.float32)
    cand = rng.integers(0, V, (B, M, 1 + K))
    noise_lp = jnp.asarray(np.log(probs)[cand], jnp.float32)
    loss = np.asarray(sampled_softmax_loss(model_logits, noise_lp, cfg.norm_term))
    corrected = np.asarray(model_logits) - cfg.norm_term - np.asarray(noise_lp)
    z = np.log(np.exp(corrected.astype(np.float64)).sum(axis=2))
    ref = z - corrected[:, :, 0]
    np.testing.assert_allclose(loss, ref, rtol=1e-4, atol=1e-5)


def test_full_ce_loss():
    rng = np.random.default_rng(4)
    scores = jnp.asarray(rng.normal(size=(B, M, V)), jnp.float32)
    target = jnp.asarray(rng.integers(0, V, (B, M)), jnp.int32)
    loss = np.asarray(full_ce_loss(scores, target))
    s = np.asarray(scores, np.float64)
    ref = np.log(np.exp(s).sum(-1)) - np.take_along_axis(
        s, np.asarray(target)[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(loss, ref, rtol=1e-5, atol=1e-5)


def test_accuracy_count():
    logits = jnp.asarray([[[3.0, 1, 2], [0, 5, 1]],
                          [[9.0, 1, 1], [2, 1, 9]]])  # (2,2,3)
    w = jnp.asarray([1.0, 1.0])
    assert float(mfp_accuracy_count(logits, w)) == 2.0  # slot0 wins twice
    assert float(mfp_accuracy_count(logits, jnp.asarray([1.0, 0.0]))) == 1.0
