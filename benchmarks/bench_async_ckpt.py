"""Async-checkpoint A/B on the chip: training wall for a fixed step window
with periodic model saves, synchronous vs background writer.

The save cost on the tunneled chip is dominated by the D2H fetch of the
1M-row tables (the Criteo-x4 proof measured ~110 s per 1000-step window of
resume saves, PERFORMANCE.md); the async writer (train/async_writer.py)
overlaps that fetch + msgpack write with the next steps, so the training
window should pay only the on-device snapshot copy (~ms) per save.

Geometry: bench.py's canonical DCNv2 / 24-field / ~1M-vocab supervised step.

Usage: python benchmarks/bench_async_ckpt.py [--steps N] [--every K]
Prints one JSON line with sync/async wall seconds and the overlap win.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arg(flag: str, default: int) -> int:
    if flag in sys.argv:
        return int(sys.argv[sys.argv.index(flag) + 1])
    return default


def main() -> None:
    import jax

    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.train import checkpoints
    from map_tpu.train import train_step as ts
    from map_tpu.train.async_writer import (AsyncCheckpointWriter,
                                            snapshot_device_tree)
    from map_tpu.train.optimizer import build_optimizer

    n_steps = _arg("--steps", 120)
    every = _arg("--every", 20)
    batch_size = 4096

    # bench.py's Avazu-like field-blocked geometry (~1M-id vocabulary)
    field_sizes = [7, 7, 24, 26, 4100, 7600, 26, 8500, 560, 36, 8200, 5,
                   4, 2600, 8, 450, 70, 170, 60, 101_000, 380_000,
                   500_000, 30, 26]
    idx_low, lo = [], 10
    for s in field_sizes:
        idx_low.append(lo)
        lo += s
    idx_high = idx_low[1:] + [lo]

    cfg = Config(
        field_blocked_lookup=True, compute_dtype="bfloat16",
        idx_low=idx_low, idx_high=idx_high,
        model_name="dcnv2", input_size=lo, num_fields=len(field_sizes),
        embed_size=16, hidden_size=1000, num_hidden_layers=3,
        hidden_act="relu", hidden_dropout_rate=0.0, num_cross_layers=3,
        pretrain=False, embed_norm=False, layer_norm_eps=1e-12,
        embed_dropout_rate=0.0, use_pallas=True,
        packed_tables=True, fused_table_update=True,
    )
    args = TrainingArguments(
        output_dir="/tmp/bench_async", learning_rate=1e-3, weight_decay=0.1,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        per_device_train_batch_size=batch_size)

    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, num_training_steps=10_000, num_warmup_steps=0)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": np.stack(
            [rng.integers(a, b, batch_size) for a, b in zip(idx_low, idx_high)],
            axis=1).astype(np.int32),
        "labels": rng.integers(0, 2, batch_size).astype(np.float32),
        "weight": np.ones(batch_size, np.float32),
    }
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                                  batch)
    train_step, _ = ts.make_supervised_steps(model, cfg, args, tx,
                                             jax.random.PRNGKey(1))
    device_batch = jax.device_put(batch)
    for _ in range(10):  # warmup/compile
        state, metrics = train_step(state, device_batch)
    float(metrics["loss"])

    def variables(st):
        return {"params": st.params}

    def run(mode: str):
        nonlocal state
        out = tempfile.mkdtemp(prefix=f"ckpt_{mode}_")
        writer = AsyncCheckpointWriter()
        saves = 0
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            state, metrics = train_step(state, device_batch)
            if i % every == 0:
                saves += 1
                if mode == "async":
                    snap = snapshot_device_tree(variables(state))
                    writer.submit(
                        lambda s=snap, k=i: checkpoints.save_model(s, out, k))
                elif mode == "write_offload":
                    # fetch synchronously (no link contention), offload only
                    # the msgpack serialization + disk write
                    host = jax.device_get(variables(state))
                    writer.submit(
                        lambda h=host, k=i: checkpoints.save_model(h, out, k))
                else:
                    checkpoints.save_model(
                        jax.device_get(variables(state)), out, i)
        writer.wait()  # durable before the clock stops
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        return dt, saves

    sync_s, saves = run("sync")
    async_s, _ = run("async")
    wo_s, _ = run("write_offload")
    # order-control: rerun sync to bound drift
    sync2_s, _ = run("sync")
    sync_best = min(sync_s, sync2_s)
    print(json.dumps({
        "metric": "async_ckpt_window_wall_s",
        "steps": n_steps, "saves": saves,
        "sync_s": round(sync_best, 2), "async_s": round(async_s, 2),
        "write_offload_s": round(wo_s, 2),
        "async_win_s_per_save": round((sync_best - async_s) / saves, 3),
        "wo_win_s_per_save": round((sync_best - wo_s) / saves, 3),
    }))
    print(f"sync trials = {sync_s:.2f}/{sync2_s:.2f} s, async = {async_s:.2f} s"
          f", write_offload = {wo_s:.2f} s", file=sys.stderr)


if __name__ == "__main__":
    main()
