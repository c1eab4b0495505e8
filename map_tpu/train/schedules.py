"""Learning-rate schedules with transformers-parity shapes.

The reference uses transformers' `get_cosine_schedule_with_warmup` and
`get_constant_schedule_with_warmup` (`code/trainer.py:77-83`), stepped once per
optimizer step. Matching the schedule shape step-for-step is required for AUC
parity (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def constant_with_warmup(base_lr: float, num_warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        return base_lr * jnp.where(step < num_warmup_steps, warm, 1.0)

    return schedule


def cosine_with_warmup(base_lr: float, num_warmup_steps: int,
                       num_training_steps: int, num_cycles: float = 0.5):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def make_schedule(lr_sched: str, base_lr: float, num_warmup_steps: int,
                  num_training_steps: int):
    s = lr_sched.lower()
    if s == "cosine":
        return cosine_with_warmup(base_lr, num_warmup_steps, num_training_steps)
    if s == "const":
        return constant_with_warmup(base_lr, num_warmup_steps)
    raise NotImplementedError(lr_sched)
