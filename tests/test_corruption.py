"""Corruption-engine properties (reference semantics: `code/trainer.py:217-266`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.objectives import corruption

B, F = 64, 10
INPUT_SIZE = 300


def _ids(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(10, INPUT_SIZE, (B, F)), jnp.int32)


def test_mask_num_formula():
    assert corruption.mask_num_of(24, 0.3) == 7  # int(24*0.3), trainer.py:220
    assert corruption.mask_num_of(10, 0.3) == 3


def test_normal_sampling_without_replacement():
    key = jax.random.PRNGKey(0)
    idx = corruption.sample_masked_index(key, B, F, 4, "normal")
    assert idx.shape == (B, 4)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 4  # no duplicates
        assert all(0 <= v < F for v in row)


def test_randint_sampling_range():
    idx = corruption.sample_masked_index(jax.random.PRNGKey(1), B, F, 4, "randint")
    a = np.asarray(idx)
    assert a.min() >= 0 and a.max() < F


def test_mfp_gather_scatter_roundtrip():
    ids = _ids()
    corrupted, labels, midx = corruption.mfp_corrupt(
        jax.random.PRNGKey(0), ids, 3, "normal")
    ids_np, c_np, l_np, m_np = map(np.asarray, (ids, corrupted, labels, midx))
    for b in range(B):
        for j in range(3):
            # label = original id at the masked position (trainer.py:230)
            assert l_np[b, j] == ids_np[b, m_np[b, j]]
            # masked position contains the literal <mask>=3 (trainer.py:229-231)
            assert c_np[b, m_np[b, j]] == 3
        # untouched positions unchanged
        untouched = set(range(F)) - set(m_np[b].tolist())
        for j in untouched:
            assert c_np[b, j] == ids_np[b, j]


def test_rfd_labels_are_mismatch_indicator():
    ids = _ids()
    corrupted, labels = corruption.rfd_corrupt(
        jax.random.PRNGKey(0), ids, 3, "normal", "Whole-Uniform", INPUT_SIZE)
    c, l, i = map(np.asarray, (corrupted, labels, ids))
    assert np.array_equal(l, (i != c).astype(np.float32))
    # at most mask_num positives per row; untouched rows have label 0
    assert (l.sum(axis=1) <= 3).all()


def test_rfd_uniform_stays_in_field_block():
    rng = np.random.default_rng(0)
    idx_low = np.arange(10, 10 + F * 29, 29, dtype=np.int32)
    idx_high = idx_low + 29
    ids = jnp.asarray(idx_low[None, :] + rng.integers(0, 29, (B, F)), jnp.int32)
    corrupted, labels = corruption.rfd_corrupt(
        jax.random.PRNGKey(0), ids, 3, "randint", "Uniform", int(idx_high[-1]),
        idx_low=jnp.asarray(idx_low), idx_high=jnp.asarray(idx_high))
    c = np.asarray(corrupted)
    assert ((c >= idx_low[None, :]) & (c < idx_high[None, :])).all()


def test_rfd_unigram_uses_noise_rows():
    ids = _ids()
    noise_rows = jnp.full((B * 3, F), 77, jnp.int32)
    corrupted, labels = corruption.rfd_corrupt(
        jax.random.PRNGKey(0), ids, 3, "normal", "Unigram", INPUT_SIZE,
        noise_rows=noise_rows)
    c, i, l = map(np.asarray, (corrupted, ids, labels))
    changed = c != i
    assert (c[changed] == 77).all()  # replacements come from the noise rows
    assert np.array_equal(l, changed.astype(np.float32))


def test_whole_uniform_range():
    ids = _ids()
    corrupted, _ = corruption.rfd_corrupt(
        jax.random.PRNGKey(0), ids, 3, "normal", "Whole-Uniform", INPUT_SIZE)
    c, i = np.asarray(corrupted), np.asarray(ids)
    replaced = c[c != i]
    assert (replaced >= 10).all() and (replaced < INPUT_SIZE).all()
