"""A/B the full DCNv2 train step: XLA scatter backward vs Pallas scatter
backward vs pallas-cross on/off. One process, sequential compiles."""

from __future__ import annotations

import time

import numpy as np

import jax


def run_variant(name, use_pallas_cross, fast_grad):
    import jax.numpy as jnp

    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.ops import embedding as emb_ops
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    emb_ops.FAST_GRAD_ENABLED = fast_grad
    b, f, v = 4096, 24, 1_000_000
    cfg = Config(model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
                 hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
                 hidden_dropout_rate=0.0, num_cross_layers=3, pretrain=False,
                 embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
                 use_pallas=use_pallas_cross)
    args = TrainingArguments(output_dir="/tmp/ab", learning_rate=1e-3,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    rng = np.random.default_rng(0)
    batch = jax.device_put({
        "input_ids": np.asarray(rng.integers(10, v, (b, f)), np.int32),
        "labels": rng.integers(0, 2, b).astype(np.float32),
        "weight": np.ones(b, np.float32)})
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    step, _ = ts.make_supervised_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    for _ in range(5):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(50):
        state, m = step(state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 50
    print(f"{name:34s} {dt * 1e3:7.2f} ms/step  {b / dt:10.0f} ex/s", flush=True)


def main():
    run_variant("xla-scatter + xla-cross", False, False)
    run_variant("xla-scatter + pallas-cross", True, False)
    run_variant("pallas-scatter + xla-cross", False, True)
    run_variant("pallas-scatter + pallas-cross", True, True)


if __name__ == "__main__":
    main()
