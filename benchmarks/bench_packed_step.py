"""A/B: canonical DCNv2 supervised train step, packed_tables False vs True.

Usage: python benchmarks/bench_packed_step.py [flat|packed|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(packed: bool) -> float:
    import jax

    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    batch_size, num_fields, input_size = 4096, 24, 1_000_000
    cfg = Config(
        model_name="dcnv2", input_size=input_size, num_fields=num_fields,
        embed_size=16, hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
        hidden_dropout_rate=0.0, num_cross_layers=3, pretrain=False,
        embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
        use_pallas=True, packed_tables=packed)
    args = TrainingArguments(
        output_dir="/tmp/bench", learning_rate=1e-3, weight_decay=0.1,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        per_device_train_batch_size=batch_size)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, num_training_steps=10_000, num_warmup_steps=0)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": np.asarray(
            rng.integers(10, input_size, (batch_size, num_fields)), np.int32),
        "labels": rng.integers(0, 2, batch_size).astype(np.float32),
        "weight": np.ones(batch_size, np.float32),
    }
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                                  batch)
    train_step, _ = ts.make_supervised_steps(model, cfg, args, tx,
                                             jax.random.PRNGKey(1))
    device_batch = jax.device_put(batch)
    for _ in range(10):
        state, metrics = train_step(state, device_batch)
    float(metrics["loss"])
    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = train_step(state, device_batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    ms = dt / n * 1e3
    print(f"packed={packed}: {ms:.2f} ms/step, "
          f"{batch_size * n / dt:,.0f} examples/s", flush=True)
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("flat", "both"):
        run(False)
    if which in ("packed", "both"):
        run(True)


if __name__ == "__main__":
    main()
