"""MFP loss modes: nce / sampled / full all train and report sane metrics."""

import jax
import numpy as np
import pytest

import map_tpu.models as models
from map_tpu.config import TrainingArguments
from map_tpu.objectives.alias import build_alias_table, noise_distribution
from map_tpu.train import train_step as ts
from map_tpu.train.optimizer import build_optimizer
from tests.conftest import base_model_config


@pytest.mark.parametrize("loss_type", ["nce", "sampled", "full"])
def test_mfp_mode_trains(loss_type):
    v = 400
    cfg = base_model_config(model_name="dcnv2", pretrain=True, pt_type="MFP",
                            nce_loss_type=loss_type)
    rng = np.random.default_rng(0)
    probs = noise_distribution(rng.random(v) + 0.1)
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(v))
    args = TrainingArguments(
        output_dir="/tmp/mfp_modes", learning_rate=1e-3, lr_sched="const",
        weight_decay=0.05, warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.25, sampling_method="randint", pretrain=True, pt_type="MFP")
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 100, 0)
    batch = {
        "input_ids": np.asarray(rng.integers(10, v, (16, 8)), np.int32),
        "labels": np.zeros(16, np.float32),
        "weight": np.ones(16, np.float32),
    }
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    prob_t, alias_t = build_alias_table(probs)
    step, eval_step = ts.make_mfp_steps(model, cfg, args, tx, jax.random.PRNGKey(1),
                                        prob_t, alias_t, cfg.logprob_noise)
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learns on the fixed batch
    em = eval_step(state, batch, jax.random.PRNGKey(2))
    assert float(em["count"]) == 16 * 2  # mask_num = int(8*0.25) = 2
    assert 0 <= float(em["acc_count"]) <= float(em["count"])
