"""Launcher for the READ-ONLY torch reference under modern library versions.

The reference (`/root/reference/code`) imports two symbols that transformers
removed after the version it was written against:
  - `transformers.utils.cached_property` (arguments.py:10) — now just
    functools.cached_property;
  - `transformers.AdamW` (trainer.py:13) — the legacy optimizer whose
    semantics our optax optimizer is pinned against (map_tpu/train/
    optimizer.py: Adam with bias correction, then decoupled weight decay
    applied AFTER the update as `p -= lr * wd * p`).

This launcher installs faithful shims for both, then executes the reference's
run.py unmodified. Used only by validation/run_reference.sh for same-data
AUC-parity runs; nothing in map_tpu imports this.
"""

from __future__ import annotations

import functools
import runpy
import sys

import torch
import transformers
import transformers.utils as tu

if not hasattr(tu, "cached_property"):
    tu.cached_property = functools.cached_property


class _LegacyAdamW(torch.optim.Optimizer):
    """transformers' legacy AdamW: bias-corrected Adam step, then decoupled
    weight decay AFTER the step (`p += -lr * wd * p`). Matches the semantics
    map_tpu/train/optimizer.py and tests/test_optimizer.py are pinned to."""

    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-6,
                 weight_decay=0.0, correct_bias=True):
        defaults = dict(lr=lr, betas=betas, eps=eps,
                        weight_decay=weight_decay, correct_bias=correct_bias)
        super().__init__(params, defaults)

    @torch.no_grad()
    def step(self, closure=None):
        loss = closure() if closure is not None else None
        for group in self.param_groups:
            beta1, beta2 = group["betas"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad
                state = self.state[p]
                if len(state) == 0:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p)
                    state["exp_avg_sq"] = torch.zeros_like(p)
                exp_avg, exp_avg_sq = state["exp_avg"], state["exp_avg_sq"]
                state["step"] += 1
                exp_avg.mul_(beta1).add_(grad, alpha=1.0 - beta1)
                exp_avg_sq.mul_(beta2).addcmul_(grad, grad, value=1.0 - beta2)
                denom = exp_avg_sq.sqrt().add_(group["eps"])
                step_size = group["lr"]
                if group["correct_bias"]:
                    bc1 = 1.0 - beta1 ** state["step"]
                    bc2 = 1.0 - beta2 ** state["step"]
                    step_size = step_size * (bc2 ** 0.5) / bc1
                p.addcdiv_(exp_avg, denom, value=-step_size)
                if group["weight_decay"] > 0.0:
                    p.add_(p, alpha=-group["lr"] * group["weight_decay"])
        return loss


if not hasattr(transformers, "AdamW"):
    transformers.AdamW = _LegacyAdamW

sys.path.insert(0, "/root/reference/code")
sys.argv[0] = "/root/reference/code/run.py"
runpy.run_path("/root/reference/code/run.py", run_name="__main__")
