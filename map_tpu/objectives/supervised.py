"""Supervised binary-CTR objective.

Parity: reference `code/models.py:88-93` — BCEWithLogitsLoss (mean) on the
squeezed logits. Extended with per-example weights so padded batches (the
static-shape input pipeline, map_tpu.data.loader) contribute exactly zero.
"""

from __future__ import annotations

import jax.numpy as jnp

from map_tpu.objectives.nce import bce_with_logits


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             weight: jnp.ndarray) -> jnp.ndarray:
    """logits (B,) or (B,1); labels (B,); weight (B,) in {0,1}. Weighted mean."""
    per_ex = bce_with_logits(logits.reshape(-1).astype(jnp.float32),
                             labels.reshape(-1).astype(jnp.float32))
    denom = jnp.maximum(weight.sum(), 1.0)
    return (per_ex * weight).sum() / denom
