"""Alias-sampler correctness (reference `code/nce/alias_multinomial.py`)."""

import jax
import numpy as np

from map_tpu.objectives.alias import (
    alias_draw,
    build_alias_table,
    noise_distribution,
)


def test_alias_table_valid():
    rng = np.random.default_rng(0)
    probs = noise_distribution(rng.random(100) + 0.01)
    prob, alias = build_alias_table(probs)
    assert prob.shape == (100,) and alias.shape == (100,)
    assert (prob >= 0).all() and (prob <= 1 + 1e-6).all()
    assert (alias >= 0).all() and (alias < 100).all()


def test_alias_table_exactness():
    """Alias decomposition must reproduce the target pmf exactly:
    p[i] = (prob[i] + sum_j{alias[j]==i} (1-prob[j])) / K."""
    rng = np.random.default_rng(1)
    probs = noise_distribution(rng.random(50) + 0.01)
    prob, alias = build_alias_table(probs)
    k = len(probs)
    recon = prob.astype(np.float64).copy()
    for j in range(k):
        recon[alias[j]] += 1.0 - prob[j]
    recon /= k
    np.testing.assert_allclose(recon, probs, atol=1e-6)


def test_alias_draw_distribution():
    rng = np.random.default_rng(2)
    probs = noise_distribution(rng.random(20) ** 3 + 1e-4)  # skewed
    prob, alias = build_alias_table(probs)
    n = 200_000
    samples = np.asarray(alias_draw(jax.random.PRNGKey(0),
                                    np.asarray(prob), np.asarray(alias), (n,)))
    emp = np.bincount(samples, minlength=20) / n
    np.testing.assert_allclose(emp, probs, atol=0.01)


def test_native_matches_python_builder():
    """C++ alias builder vs the Python reference implementation."""
    from map_tpu import native
    from map_tpu.objectives import alias as alias_mod

    if native.get_lib() is None:
        return
    rng = np.random.default_rng(7)
    probs = noise_distribution(rng.random(500) + 0.01)
    nat_prob, nat_alias = native.build_alias(probs)
    # exactness of the native decomposition
    k = len(probs)
    recon = nat_prob.astype(np.float64).copy()
    for j in range(k):
        recon[nat_alias[j]] += 1.0 - nat_prob[j]
    np.testing.assert_allclose(recon / k, probs, atol=1e-6)


def test_noise_distribution_backoff():
    fc = np.array([0.0, 1000.0, 0.0, 500.0])
    probs = noise_distribution(fc)
    assert probs.min() > 0  # backoff clamps zeros (nce_loss.py:59-63)
    assert abs(probs.sum() - 1.0) < 1e-12
