"""Shared-noise (per_word=False) MFP mode: reference index_linear.py:108-143."""

import jax
import jax.numpy as jnp
import numpy as np

import map_tpu.models as models
from map_tpu.config import TrainingArguments
from map_tpu.objectives.alias import build_alias_table, noise_distribution
from map_tpu.train import train_step as ts
from map_tpu.train.optimizer import build_optimizer
from tests.conftest import base_model_config

V = 400


def _setup():
    cfg = base_model_config(model_name="dcnv2", pretrain=True, pt_type="MFP")
    rng = np.random.default_rng(0)
    probs = noise_distribution(rng.random(V) + 0.1)
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(V))
    args = TrainingArguments(
        output_dir="/tmp/shared_noise", learning_rate=1e-3, lr_sched="const",
        weight_decay=0.05, warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.25, sampling_method="randint", pretrain=True,
        pt_type="MFP", pt_shared_noise=True)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 100, 0)
    batch = {"input_ids": np.asarray(rng.integers(10, V, (16, 8)), np.int32),
             "labels": np.zeros(16, np.float32),
             "weight": np.ones(16, np.float32)}
    return cfg, args, model, tx, batch, probs


def test_shared_noise_scoring_matches_per_position_decoder():
    """shared_noise_logits == per-candidate decoder on broadcast candidates."""
    from map_tpu.objectives.nce import IndexLinearDecoder

    cfg, *_ = _setup()
    dec = IndexLinearDecoder(V, cfg.proj_size, cfg)
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(rng.normal(size=(4, 2, cfg.proj_size)), jnp.float32)
    target = jnp.asarray(rng.integers(10, V, (4, 2)), jnp.int32)
    noise = jnp.asarray(rng.integers(10, V, (5,)), jnp.int32)
    cand = jnp.concatenate(
        [target[..., None], jnp.broadcast_to(noise, (4, 2, 5))], axis=-1)
    params = dec.init(jax.random.PRNGKey(0), inputs, cand)
    per_pos = dec.apply(params, inputs, cand)
    shared = dec.apply(params, inputs, target, noise,
                       method=dec.shared_noise_logits)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(per_pos),
                               rtol=1e-4, atol=1e-5)


def test_shared_noise_trains():
    cfg, args, model, tx, batch, probs = _setup()
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                                  batch)
    prob_t, alias_t = build_alias_table(probs)
    step, eval_step = ts.make_mfp_steps(model, cfg, args, tx,
                                        jax.random.PRNGKey(1), prob_t, alias_t,
                                        cfg.logprob_noise)
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    em = eval_step(state, batch, jax.random.PRNGKey(2))
    assert float(em["count"]) == 16 * 2
