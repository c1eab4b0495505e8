"""Optimizer / schedule parity (reference `code/trainer.py:60-85`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.config import TrainingArguments
from map_tpu.train.optimizer import build_optimizer, no_decay_mask
from map_tpu.train.schedules import constant_with_warmup, cosine_with_warmup


def test_no_decay_mask_paths():
    params = {
        "embed": {"embedding": np.zeros((10, 4))},
        "dense": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)},
        "cross": {"kernel_0": np.zeros((4, 4)), "bias_0": np.zeros(4)},
        "ln": {"scale": np.zeros(4), "bias": np.zeros(4)},
        "graph": {"bias_p": np.zeros(4), "W_in": np.zeros((2, 4, 4))},
        "mfp_decoder": {"emb": np.zeros((10, 4)), "bias": np.zeros(10)},
    }
    mask = no_decay_mask(params)
    assert mask["embed"]["embedding"] is True     # tables decay
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["cross"]["bias_0"] is False
    assert mask["ln"]["scale"] is False           # LayerNorm.weight no decay
    assert mask["ln"]["bias"] is False
    assert mask["graph"]["bias_p"] is False
    assert mask["graph"]["W_in"] is True
    assert mask["mfp_decoder"]["bias"] is False   # '...bias.weight' in reference


def test_schedules_match_transformers():
    """Pin against transformers' LambdaLR factors (the reference's schedules)."""
    import torch
    from transformers import (
        get_constant_schedule_with_warmup,
        get_cosine_schedule_with_warmup,
    )

    total, warmup, lr = 100, 10, 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)

    ref_sched = get_cosine_schedule_with_warmup(opt, warmup, total)
    ours = cosine_with_warmup(lr, warmup, total)
    for step in range(total):
        ref_lr = ref_sched.get_last_lr()[0]
        assert abs(float(ours(step)) - ref_lr) < 1e-9, step
        opt.step()
        ref_sched.step()

    opt2 = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    ref_sched2 = get_constant_schedule_with_warmup(opt2, warmup)
    ours2 = constant_with_warmup(lr, warmup)
    for step in range(50):
        assert abs(float(ours2(step)) - ref_sched2.get_last_lr()[0]) < 1e-9
        opt2.step()
        ref_sched2.step()


def test_adamw_decoupled_wd_semantics():
    """One optax.adamw step == torch AdamW step (decoupled wd)."""
    import torch

    args = TrainingArguments(output_dir="/tmp/x", learning_rate=1e-2,
                             weight_decay=0.1, lr_sched="const",
                             adam_betas="0.9,0.999", adam_epsilon=1e-8,
                             warmup_ratio=0.0, max_grad_norm=0.0)
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    g0 = np.array([[0.1, 0.2], [-0.3, 0.4]], np.float32)

    tx, _ = build_optimizer(args, num_training_steps=10, num_warmup_steps=0)
    params = {"m": {"kernel": jnp.asarray(w0)}}
    opt_state = tx.init(params)
    updates, _ = tx.update({"m": {"kernel": jnp.asarray(g0)}}, opt_state, params)
    new = np.asarray(jnp.asarray(w0) + updates["m"]["kernel"])

    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.AdamW([tp], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.1)
    tp.grad = torch.tensor(g0)
    topt.step()
    np.testing.assert_allclose(new, tp.detach().numpy(), rtol=1e-5, atol=1e-6)
