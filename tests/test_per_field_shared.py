"""Per-field SHARED-noise MFP: field-conditional negatives (one k-noise set
per field per step) at per_word=False speed. TPU-native mode — composes the
north-star per-field sampling upgrade with the reference's per_word=False
variant (index_linear.py:108-143); no reference counterpart.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu.objectives.alias import (
    build_fused_alias,
    build_per_field_alias,
    per_field_alias_draw_logq,
)


def _per_field_setup(v=120, f=6):
    rng = np.random.default_rng(0)
    idx_low = np.arange(f) * (v // f)
    idx_high = idx_low + (v // f)
    feat_count = rng.random(v) + 0.1
    pf_prob, pf_alias, logq, lnz = build_per_field_alias(
        feat_count, idx_low, idx_high)
    fused = jnp.asarray(build_fused_alias(pf_prob, pf_alias, logq))
    return (jnp.asarray(idx_low, jnp.int32),
            jnp.asarray(idx_high - idx_low, jnp.int32), fused, logq, lnz)


def test_all_fields_draw_stays_in_blocks():
    lo, sizes, fused, logq, _ = _per_field_setup()
    f = lo.shape[0]
    k = 32
    ids, got_logq = per_field_alias_draw_logq(
        jax.random.PRNGKey(0), fused, lo, sizes,
        jnp.arange(f, dtype=jnp.int32), k)
    assert ids.shape == (f, k)
    ids_np = np.asarray(ids)
    for fi in range(f):
        assert (ids_np[fi] >= int(lo[fi])).all()
        assert (ids_np[fi] < int(lo[fi]) + int(sizes[fi])).all()
    np.testing.assert_allclose(np.asarray(got_logq), logq[ids_np], rtol=1e-6)


def test_per_field_shared_scoring_matches_per_position():
    """The dense all-fields matmul + one-hot selection equals scoring each
    position against its own field's noise set directly."""
    from map_tpu.objectives.nce import IndexLinearDecoder

    import sys

    sys.path.insert(0, "tests")
    from conftest import base_model_config

    v, f, k, proj = 120, 6, 5, 8
    cfg = base_model_config(input_size=v, num_fields=f, proj_size=proj,
                            pt_neg_num=k, pretrain=True, pt_type="MFP")
    rng_np = np.random.default_rng(1)
    cfg.logprob_noise = np.log(rng_np.random(v) + 0.1).astype(np.float32)
    cfg.norm_term = float(np.log(v))
    dec = IndexLinearDecoder(v, proj, cfg)
    b, m = 4, 3
    inputs = jnp.asarray(rng_np.standard_normal((b, m, proj)), jnp.float32)
    target = jnp.asarray(rng_np.integers(0, v, (b, m)), jnp.int32)
    fields = jnp.asarray(rng_np.integers(0, f, (b, m)), jnp.int32)
    noise_f = jnp.asarray(rng_np.integers(0, v, (f, k)), jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), inputs,
                         jnp.zeros((b, m, 1 + k), jnp.int32))
    got = dec.apply(variables, inputs, target, fields, noise_f,
                    method=dec.per_field_shared_noise_logits)
    # oracle: per-position candidate list [target, noise_f[field]]
    noise_per_pos = jnp.take(noise_f, fields, axis=0)        # (B, M, k)
    cands = jnp.concatenate([target[..., None], noise_per_pos], axis=-1)
    want = dec.apply(variables, inputs, cands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_per_field_shared_e2e_learns(tmp_path, synth_dir):
    from map_tpu.run import main

    rc = main([
        "--model_name", "dcnv2", "--output_dir", str(tmp_path),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--per_device_train_batch_size", "256",
        "--per_device_eval_batch_size", "512",
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--logging_steps", "50",
        "--hidden_dropout_rate", "0.0", "--proj_size", "8",
        "--pretrain", "--pt_type", "MFP", "--sampling_method", "randint",
        "--mask_ratio", "0.3", "--pt_neg_num", "5",
        "--pt_shared_noise", "--pt_per_field_noise",
        "--learning_rate", "1e-3", "--num_train_epochs", "1",
        "--lr_sched", "cosine", "--weight_decay", "0.05"])
    assert rc == 0
    log = open(str(tmp_path) + "/train.log").read()
    accs = [float(x) for x in re.findall(r"'eval_mfp_acc': ([\d.]+)", log)]
    # field-conditional negatives make the task harder than global noise but
    # it must still beat 1-in-(1+k) chance
    assert accs and accs[-1] > 1.0 / 6
