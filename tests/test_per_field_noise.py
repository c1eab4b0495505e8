"""Per-field candidate sampling (north-star upgrade over the reference's
global unigram noise, SURVEY.md §2.4 NOTE)."""

import jax
import numpy as np
import pytest

from map_tpu.objectives.alias import (
    build_per_field_alias,
    noise_distribution,
    per_field_alias_draw,
)

F, PER = 5, 40
V = 10 + F * PER


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    feat_count = np.zeros(V, np.float32)
    idx_low = 10 + PER * np.arange(F)
    idx_high = idx_low + PER
    for lo, hi in zip(idx_low, idx_high):
        feat_count[lo:hi] = rng.random(PER) ** 2 * 100 + 1
    return feat_count, idx_low.astype(np.int32), idx_high.astype(np.int32)


def test_samples_stay_in_field_block():
    feat_count, lo, hi = _setup()
    prob, alias, logq, lnz = build_per_field_alias(feat_count, lo, hi)
    fields = np.asarray(np.random.default_rng(1).integers(0, F, (64, 3)),
                        np.int32)
    sizes = (hi - lo).astype(np.int32)
    out = np.asarray(per_field_alias_draw(
        jax.random.PRNGKey(0), prob, alias, lo, sizes, fields, 10))
    assert out.shape == (64, 3, 10)
    for b in range(64):
        for m in range(3):
            f = fields[b, m]
            assert (out[b, m] >= lo[f]).all() and (out[b, m] < hi[f]).all()


def test_per_field_distribution_matches_unigram():
    feat_count, lo, hi = _setup(2)
    prob, alias, logq, lnz = build_per_field_alias(feat_count, lo, hi)
    f = 2
    fields = np.full((2000, 1), f, np.int32)
    sizes = (hi - lo).astype(np.int32)
    out = np.asarray(per_field_alias_draw(
        jax.random.PRNGKey(1), prob, alias, lo, sizes, fields, 50)).ravel()
    emp = np.bincount(out - lo[f], minlength=PER) / out.size
    want = noise_distribution(feat_count[lo[f]:hi[f]])
    np.testing.assert_allclose(emp, want, atol=0.01)


def test_logq_and_lnz_consistency():
    feat_count, lo, hi = _setup(3)
    _, _, logq, lnz = build_per_field_alias(feat_count, lo, hi)
    for f in range(F):
        block = np.exp(logq[lo[f]:hi[f]].astype(np.float64))
        assert abs(block.sum() - 1.0) < 1e-5  # normalized WITHIN field
        np.testing.assert_allclose(lnz[lo[f]:hi[f]], np.log(PER), atol=1e-6)


def test_mfp_trains_with_per_field_noise(tmp_path, synth_dir):
    from map_tpu.run import main

    rc = main([
        "--model_name", "dcnv2", "--output_dir", str(tmp_path),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--pretrain", "--pt_type", "MFP", "--pt_per_field_noise",
        "--sampling_method", "randint", "--mask_ratio", "0.3",
        "--pt_neg_num", "5", "--proj_size", "8",
        "--per_device_train_batch_size", "256",
        "--per_device_eval_batch_size", "512",
        "--learning_rate", "1e-3", "--num_train_epochs", "1",
        "--lr_sched", "cosine", "--weight_decay", "0.05",
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--logging_steps", "50",
        "--hidden_dropout_rate", "0.0"])
    assert rc == 0
    import re
    log = open(tmp_path / "train.log").read()
    accs = [float(x) for x in re.findall(r"'eval_mfp_acc': ([\d.]+)", log)]
    # per-field negatives are harder than global ones, but the model must
    # still beat 1-in-(1+k) chance
    assert accs and accs[-1] > 1.0 / 6
