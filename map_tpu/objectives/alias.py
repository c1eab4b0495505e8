"""Walker alias method for O(1) categorical sampling over large vocabularies.

Table construction parity: reference `code/nce/alias_multinomial.py:43-70`
(host-side, cached to disk). Sampling parity: `alias_multinomial.py:81-97`
(uniform bucket + bernoulli vs kept prob + alias redirect) — but jitted and
executed on device with `jax.random`, so the MFP noise draw lives inside the
train step instead of a host round trip.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BACKOFF_PROB = 1e-10  # nce_loss.py:10


def noise_distribution(feat_count: np.ndarray) -> np.ndarray:
    """Renormalized unigram noise distribution with backoff (nce_loss.py:59-63)."""
    noise = np.asarray(feat_count, dtype=np.float64)
    probs = noise / noise.sum()
    probs = np.clip(probs, BACKOFF_PROB, None)
    return (probs / probs.sum()).astype(np.float64)


def build_alias_table(probs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """O(V) alias table construction (alias_multinomial.py:43-70).

    Uses the native C++ builder when available (the Python loop takes minutes
    at CTR vocabulary sizes); this Python path doubles as its test oracle.
    """
    from map_tpu import native

    built = native.build_alias(probs)
    if built is not None:
        return built

    k = len(probs)
    prob = (np.asarray(probs, dtype=np.float64) * k).copy()
    alias = np.zeros(k, dtype=np.int64)

    smaller = [i for i in range(k) if prob[i] < 1.0]
    larger = [i for i in range(k) if prob[i] >= 1.0]
    while smaller and larger:
        small = smaller.pop()
        large = larger.pop()
        alias[small] = large
        prob[large] = (prob[large] - 1.0) + prob[small]
        if prob[large] < 1.0:
            smaller.append(large)
        else:
            larger.append(large)
    for last in smaller + larger:
        prob[last] = 1.0
    return prob.astype(np.float32), alias.astype(np.int32)


def load_or_build_alias(data_dir: str, probs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Disk-cached table (reference caches at alias_multinomial.py:33-37,75-76)."""
    prob_file = os.path.join(data_dir, "alias_prob.npy")
    alias_file = os.path.join(data_dir, "alias_alias.npy")
    if os.path.exists(prob_file) and os.path.exists(alias_file):
        return np.load(prob_file), np.load(alias_file)
    prob, alias = build_alias_table(probs)
    try:
        np.save(prob_file, prob)
        np.save(alias_file, alias)
    except OSError:
        pass
    return prob, alias


def alias_draw(key: jax.Array, prob: jnp.ndarray, alias: jnp.ndarray,
               shape: Tuple[int, ...]) -> jnp.ndarray:
    """Jitted on-device draw (semantics of alias_multinomial.py:81-97)."""
    k_bucket, k_bern = jax.random.split(key)
    v = prob.shape[0]
    kk = jax.random.randint(k_bucket, shape, 0, v)
    keep = jax.random.uniform(k_bern, shape) < jnp.take(prob, kk)
    return jnp.where(keep, kk, jnp.take(alias, kk))
