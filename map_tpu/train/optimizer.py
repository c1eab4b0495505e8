"""Optimizer factory: AdamW with decoupled weight decay and a no-decay mask.

Parity: reference `code/trainer.py:60-85` — two param groups, weight decay on
everything except names containing "bias" / "LayerNorm.weight"; betas parsed
from a csv flag; optional global-norm gradient clipping applied before the
update (`trainer.py:137-140`). transformers' legacy AdamW applies
`p -= lr * wd * p` after the Adam step, which is exactly optax.adamw's
decoupled decay.
"""

from __future__ import annotations

from typing import Any

import optax
from flax import traverse_util

from map_tpu.train.schedules import make_schedule


def no_decay_mask(params: Any) -> Any:
    """True = apply weight decay. No decay for biases and norm scales.

    Mapping of the reference's name filter (trainer.py:61): torch "bias"
    substring -> our leaf names starting with 'bias' (Dense/Conv/GRU biases,
    LR bias, GraphLayer bias_p, CrossNetV2 bias_i, NCE decoder bias table,
    LayerNorm/BatchNorm bias); torch "LayerNorm.weight" -> our norm 'scale'.
    """
    flat = traverse_util.flatten_dict(params)

    def decay(path) -> bool:
        leaf = path[-1]
        if leaf.startswith("bias"):
            return False
        if leaf == "scale":  # LayerNorm / BatchNorm scale
            return False
        return True

    return traverse_util.unflatten_dict({k: decay(k) for k in flat})


def build_optimizer(args, num_training_steps: int, num_warmup_steps: int
                    ) -> optax.GradientTransformation:
    beta1, beta2 = (float(x) for x in args.adam_betas.split(","))
    schedule = make_schedule(args.lr_sched, args.learning_rate,
                             num_warmup_steps, num_training_steps)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=beta1,
        b2=beta2,
        eps=args.adam_epsilon,
        weight_decay=args.weight_decay,
        mask=no_decay_mask,
    )
    if args.max_grad_norm and args.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm), tx)
    return tx, schedule
