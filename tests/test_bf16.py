"""bfloat16 compute path: params stay f32, forward runs in bf16, logits close
to the f32 forward."""

import jax
import jax.numpy as jnp
import numpy as np

import map_tpu.models as models
from tests.conftest import base_model_config


def test_bf16_forward_close_to_f32():
    ids = jnp.asarray(np.random.default_rng(0).integers(10, 400, (16, 8)),
                      jnp.int32)
    cfg32 = base_model_config(model_name="dcnv2", compute_dtype="float32")
    cfg16 = base_model_config(model_name="dcnv2", compute_dtype="bfloat16")
    m32 = models.from_config(cfg32)
    m16 = models.from_config(cfg16)
    v32 = m32.init({"params": jax.random.PRNGKey(0)}, ids)
    v16 = m16.init({"params": jax.random.PRNGKey(0)}, ids)
    # identical param trees (params stay float32)
    for a, b in zip(jax.tree.leaves(v32["params"]), jax.tree.leaves(v16["params"])):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out32 = np.asarray(m32.apply(v32, ids), np.float64)
    out16 = np.asarray(m16.apply(v16, ids).astype(jnp.float32), np.float64)
    # bf16 has ~3 decimal digits; logits are O(1)
    np.testing.assert_allclose(out16, out32, atol=0.15)
    assert not np.array_equal(out16, out32)  # actually ran reduced precision


def test_bf16_train_step_runs():
    from map_tpu.config import TrainingArguments
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    cfg = base_model_config(model_name="dcnv2", compute_dtype="bfloat16")
    args = TrainingArguments(output_dir="/tmp/bf16", learning_rate=1e-2,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 100, 0)
    rng = np.random.default_rng(0)
    batch = {"input_ids": np.asarray(rng.integers(10, 400, (16, 8)), np.int32),
             "labels": rng.integers(0, 2, 16).astype(np.float32),
             "weight": np.ones(16, np.float32)}
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    step, _ = ts.make_supervised_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
