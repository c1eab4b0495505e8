"""Scaling harness: train-step examples/s across mesh shapes.

BASELINE.md asks for examples/s at 1 chip / 1 host / N hosts. On real
multi-chip hardware this sweeps (data, model) mesh shapes over the available
devices; on a single chip it degenerates to the 1-chip number. Can also run
on the CPU virtual mesh (MAP_TPU_MOCK=8) to validate the sweep structure.
"""

from __future__ import annotations

import os
import time

import numpy as np

if os.environ.get("MAP_TPU_MOCK"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={os.environ['MAP_TPU_MOCK']}")

import jax  # noqa: E402

if os.environ.get("MAP_TPU_MOCK"):
    jax.config.update("jax_platforms", "cpu")


def bench_mesh(num_data: int, num_model: int, batch_per_device: int = 4096,
               iters: int = 30):
    import jax.numpy as jnp

    import map_tpu.models as models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.parallel.mesh import build_mesh
    from map_tpu.parallel.sharding import shard_batch, shard_state
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    n_dev = num_data * num_model
    mesh = build_mesh(num_data, num_model, devices=jax.devices()[:n_dev])
    b, f, v = batch_per_device * num_data, 24, 1_000_000
    cfg = Config(model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
                 hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
                 hidden_dropout_rate=0.0, num_cross_layers=3, pretrain=False,
                 embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
                 use_pallas=False)
    args = TrainingArguments(output_dir="/tmp/scale", learning_rate=1e-3,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    rng = np.random.default_rng(0)
    batch = {"input_ids": np.asarray(rng.integers(10, v, (b, f)), np.int32),
             "labels": rng.integers(0, 2, b).astype(np.float32),
             "weight": np.ones(b, np.float32)}
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    table_mode = "rows" if num_model > 1 else "replicated"
    state = shard_state(state, mesh, table_mode)
    dbatch = shard_batch(batch, mesh)
    step, _ = ts.make_supervised_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    for _ in range(5):
        state, m = step(state, dbatch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, dbatch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"mesh data={num_data} model={num_model}: {dt * 1e3:7.2f} ms/step "
          f"{b / dt:12,.0f} ex/s  {b / dt / n_dev:12,.0f} ex/s/chip")
    return b / dt


def main():
    n = jax.device_count()
    shapes = [(1, 1)]
    if n >= 2:
        shapes += [(n, 1), (n // 2, 2)]
    if n >= 8:
        shapes += [(n // 4, 4)]
    for d, m in shapes:
        bench_mesh(d, m, batch_per_device=4096 if n <= 2 else 512)


if __name__ == "__main__":
    main()
