"""Fused table AdamW (map_tpu.ops.fused_adamw + optimizer.PartitionedTx)
must match optax.adamw exactly on every leaf, table or not."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from map_tpu.config import TrainingArguments
from map_tpu.ops.fused_adamw import fused_adamw_dense, pack_scalars
from map_tpu.train.optimizer import (
    PartitionedTx,
    apply_updates,
    build_optimizer,
    is_table_leaf,
    no_decay_mask,
)
from map_tpu.train.schedules import make_schedule


def _params():
    rng = np.random.default_rng(0)
    return {
        "embed": {"embedding": jnp.asarray(rng.normal(size=(8192, 16)) * 0.1,
                                           jnp.float32)},
        "tower": {"dense": {"kernel": jnp.asarray(rng.normal(size=(16, 8)),
                                                  jnp.float32),
                            "bias": jnp.zeros(8, jnp.float32)}},
    }


def _grads(seed):
    rng = np.random.default_rng(seed)
    return {
        "embed": {"embedding": jnp.asarray(rng.normal(size=(8192, 16)),
                                           jnp.float32)},
        "tower": {"dense": {"kernel": jnp.asarray(rng.normal(size=(16, 8)),
                                                  jnp.float32),
                            "bias": jnp.asarray(rng.normal(size=(8,)),
                                                jnp.float32)}},
    }


def test_partition_heuristic():
    params = _params()
    flags = jax.tree_util.tree_map_with_path(is_table_leaf, params)
    assert flags["embed"]["embedding"] is True
    assert flags["tower"]["dense"]["kernel"] is False
    assert flags["tower"]["dense"]["bias"] is False


@pytest.mark.parametrize("lr_sched", ["const", "cosine"])
def test_partitioned_tx_matches_optax(lr_sched):
    params = _params()
    schedule = make_schedule(lr_sched, 1e-3, 2, 20)
    kw = dict(b1=0.9, b2=0.999, eps=1e-8)
    ref_tx = optax.adamw(learning_rate=schedule, weight_decay=0.1,
                         mask=no_decay_mask, **kw)
    fused_tx = PartitionedTx(schedule, 0.9, 0.999, 1e-8, 0.1)

    p_ref, s_ref = params, ref_tx.init(params)
    p_fused, s_fused = params, fused_tx.init(params)
    for step in range(5):
        g = _grads(step + 1)
        u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fused, s_fused = fused_tx.update(g, s_fused, p_fused)
        p_fused = apply_updates(p_fused, u_fused)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_kernel_interpret_matches_xla_math():
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.normal(size=(1024, 128)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(1024, 128)) * 0.01, jnp.float32)
    nu = jnp.asarray(rng.random((1024, 128)) * 0.01, jnp.float32)
    g = jnp.asarray(rng.normal(size=(1024, 128)), jnp.float32)
    scalars = pack_scalars(1e-3, 0.1, 0.9, 0.999, 1e-8, 3.0)
    ref = fused_adamw_dense(p, mu, nu, g, scalars)  # XLA fallback off-TPU
    got = fused_adamw_dense(p, mu, nu, g, scalars, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_build_optimizer_fused_default_and_clip_fallback():
    args = TrainingArguments(output_dir="/tmp/x", learning_rate=1e-3,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    tx, _ = build_optimizer(args, 100, 0)
    assert isinstance(tx, PartitionedTx)
    args.max_grad_norm = 1.0
    tx, _ = build_optimizer(args, 100, 0)
    assert not isinstance(tx, PartitionedTx)
    args.max_grad_norm = 0.0
    args.fused_table_update = False
    tx, _ = build_optimizer(args, 100, 0)
    assert not isinstance(tx, PartitionedTx)
