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


# ---------------------------------------------------------------------------
# Per-field candidate sampling — the north-star upgrade over the reference's
# GLOBAL unigram noise (SURVEY.md §2.4 NOTE: `get_noise` has no field
# conditioning). Noise for a masked position is drawn from the unigram
# distribution of the SAME FIELD's id block, which makes the MFP contrast
# field-consistent (negatives are plausible values of that field).
#
# Layout: one flat alias table over the whole vocabulary where each field's
# contiguous id block [idx_low_f, idx_high_f) is its own alias table, with
# redirects stored as GLOBAL ids — O(V) memory, no per-field padding.
# ---------------------------------------------------------------------------

def build_per_field_alias(feat_count: np.ndarray, idx_low: np.ndarray,
                          idx_high: np.ndarray):
    """Returns (prob_all (V,), alias_all (V,) global ids, logq (V,),
    lnz (V,)) for field-conditional sampling.

    logq[i] = log q_{field(i)}(i) (renormalized-within-field with backoff),
    lnz[i] = log(field_size) — the per-field 'auto' norm_term analog
    (nce_loss.py:69-72 applies log(V) globally).
    """
    v = len(feat_count)
    prob_all = np.ones(v, np.float32)
    alias_all = np.arange(v, dtype=np.int32)
    logq = np.full(v, np.log(BACKOFF_PROB), np.float32)
    lnz = np.zeros(v, np.float32)
    for lo, hi in zip(np.asarray(idx_low), np.asarray(idx_high)):
        lo, hi = int(lo), int(hi)
        probs_f = noise_distribution(feat_count[lo:hi])
        p, a = build_alias_table(probs_f)
        prob_all[lo:hi] = p
        alias_all[lo:hi] = a.astype(np.int32) + lo  # localize -> global ids
        logq[lo:hi] = np.log(probs_f).astype(np.float32)
        lnz[lo:hi] = np.log(hi - lo)
    return prob_all, alias_all, logq, lnz


def per_field_alias_draw(key: jax.Array, prob_all: jnp.ndarray,
                         alias_all: jnp.ndarray, idx_low: jnp.ndarray,
                         field_sizes: jnp.ndarray, fields: jnp.ndarray,
                         num_samples: int) -> jnp.ndarray:
    """Draw `num_samples` ids per position from each position's field block.

    fields (B, M) int = the masked field index of each position. Returns
    (B, M, num_samples) global ids.
    """
    k_bucket, k_bern = jax.random.split(key)
    lo = jnp.take(idx_low, fields)[..., None]          # (B, M, 1)
    size = jnp.take(field_sizes, fields)[..., None]
    shape = (*fields.shape, num_samples)
    u = jax.random.uniform(k_bucket, shape)
    kk = lo + jnp.floor(u * size).astype(jnp.int32)     # global bucket id
    keep = jax.random.uniform(k_bern, shape) < jnp.take(prob_all, kk)
    return jnp.where(keep, kk, jnp.take(alias_all, kk))


# ---------------------------------------------------------------------------
# Fused draw tables: dynamic row gathers cost ~10 ms per 745k rows on v5e
# regardless of width, so the draw packs [prob, alias, logq, logq[alias]]
# into ONE (V, 4) f32 table — one gather instead of two, and the noise ids'
# log-probabilities (needed by the NCE loss, nce_loss.py:120-129) come out of
# the same rows for free instead of a third full-stream gather.
# ---------------------------------------------------------------------------

def build_fused_alias(prob: np.ndarray, alias: np.ndarray,
                      logq: np.ndarray) -> np.ndarray:
    """(V, 4) f32 fused table: [keep-prob, bitcast(alias id), logq, logq[alias]]."""
    alias_i = np.ascontiguousarray(np.asarray(alias, np.int32))
    logq = np.asarray(logq, np.float32)
    return np.stack([
        np.asarray(prob, np.float32),
        alias_i.view(np.float32),
        logq,
        logq[alias_i],
    ], axis=1)


def alias_draw_logq(key: jax.Array, fused: jnp.ndarray,
                    shape: Tuple[int, ...]):
    """One-gather draw. Returns (ids, logq_of_ids), both `shape`."""
    k_bucket, k_bern = jax.random.split(key)
    v = fused.shape[0]
    kk = jax.random.randint(k_bucket, shape, 0, v)
    rows = jnp.take(fused, kk, axis=0)
    al = jax.lax.bitcast_convert_type(rows[..., 1], jnp.int32)
    keep = jax.random.uniform(k_bern, shape) < rows[..., 0]
    return (jnp.where(keep, kk, al),
            jnp.where(keep, rows[..., 2], rows[..., 3]))


def per_field_alias_draw_logq(key: jax.Array, fused: jnp.ndarray,
                              idx_low: jnp.ndarray, field_sizes: jnp.ndarray,
                              fields: jnp.ndarray, num_samples: int):
    """Field-conditional one-gather draw (see per_field_alias_draw).
    Returns (ids, logq_of_ids), both (B, M, num_samples)."""
    k_bucket, k_bern = jax.random.split(key)
    lo = jnp.take(idx_low, fields)[..., None]
    size = jnp.take(field_sizes, fields)[..., None]
    shape = (*fields.shape, num_samples)
    u = jax.random.uniform(k_bucket, shape)
    kk = lo + jnp.floor(u * size).astype(jnp.int32)
    rows = jnp.take(fused, kk, axis=0)
    al = jax.lax.bitcast_convert_type(rows[..., 1], jnp.int32)
    keep = jax.random.uniform(k_bern, shape) < rows[..., 0]
    return (jnp.where(keep, kk, al),
            jnp.where(keep, rows[..., 2], rows[..., 3]))
