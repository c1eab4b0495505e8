"""Ablation breakdown of the RFD-Unigram step (VERDICT round-3 next #1:
4.6 ms -> target <= 4.4 ms = 3x of the 300k ex/s denominator). The step is
supervised + on-device corruption + a two-layer detection head; the
supervised step costs 3.0 ms, so ~1.6 ms sits in corrupt/head/loss.

Variants (same discipline as bench_pf_parts.py):
  full        - production make_rfd_steps step
  precorrupt  - corruption hoisted to host inputs (full - precorrupt = corrupt)
  sup         - supervised step, same geometry (tower + input AdamW floor)
  no_head     - detection head replaced by a (B, F) broadcast of the
                supervised logit (full - no_head = head cost)

Usage: python benchmarks/bench_rfd_parts.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench_pretrain as bp


def timeit(step, state, batch, warmup=5, iters=30):
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from map_tpu import models
    from map_tpu.config import TrainingArguments
    from map_tpu.objectives import corruption
    from map_tpu.objectives.nce import bce_with_logits
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    which = set(sys.argv[1:]) or {"full", "precorrupt", "sup", "no_head"}
    b = 4096
    idx_low, idx_high, v = bp.geometry()
    rng = np.random.default_rng(0)
    f = len(bp.FIELD_SIZES)
    cfg = bp.base_config(v, f, idx_low, idx_high, pretrain=True,
                         pt_type="RFD", proj_size=32,
                         field_blocked_lookup=True)
    args = TrainingArguments(
        output_dir="/tmp/bench_rfd", learning_rate=1e-3, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.3, sampling_method="randint", pretrain=True,
        pt_type="RFD", RFD_replace="Unigram")
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    np_batch = bp.field_blocked_batch(rng, b, idx_low, idx_high)
    mask_num = corruption.mask_num_of(f, args.mask_ratio)
    np_batch["noise_rows"] = bp.field_blocked_batch(
        rng, b * mask_num, idx_low, idx_high)["input_ids"]
    batch = jax.device_put(np_batch)
    state0 = ts.create_train_state(model, cfg, args, tx,
                                   jax.random.PRNGKey(0), batch)
    host_state = jax.device_get(state0)
    del state0

    def fresh():
        return jax.device_put(host_state)

    results = {}
    base_rng = jax.random.PRNGKey(1)

    if "full" in which:
        step, _ = ts.make_rfd_steps(model, cfg, args, tx, base_rng)
        results["full"] = timeit(step, fresh(), batch)
        print(f"full          {results['full']*1e3:7.2f} ms", flush=True)

    if "precorrupt" in which:
        c_np, l_np = jax.device_get(corruption.rfd_corrupt(
            jax.random.PRNGKey(9), jnp.asarray(batch["input_ids"]), mask_num,
            args.sampling_method, "Unigram", v,
            noise_rows=jnp.asarray(batch["noise_rows"])))
        pb = dict(batch, corrupted=jnp.asarray(c_np),
                  rfd_labels=jnp.asarray(l_np))

        def step_pc(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            _, k_drop = jax.random.split(rng)
            corrupted, labels = batch["corrupted"], batch["rfd_labels"]

            def loss_fn(params):
                logits, new_bs = ts._apply_train(model, state, params,
                                                 corrupted, k_drop)
                per = bce_with_logits(logits, labels)
                denom = jnp.maximum(batch["weight"].sum(), 1.0) * f
                loss = (per * batch["weight"][:, None]).sum() / denom
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = ts._update(tx, state, grads, new_bs)
            return new_state, {"loss": loss}

        results["precorrupt"] = timeit(
            jax.jit(step_pc, donate_argnums=(0,)), fresh(), pb)
        print(f"precorrupt    {results['precorrupt']*1e3:7.2f} ms", flush=True)

    if "no_head" in which:
        def step_nh(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            k_c, k_drop = jax.random.split(rng)
            corrupted, labels = corruption.rfd_corrupt(
                k_c, batch["input_ids"], mask_num, args.sampling_method,
                "Unigram", v, noise_rows=batch["noise_rows"])

            def head_bc(mdl, input_ids, train=True):
                vec = mdl.backbone(input_ids, train)
                return jnp.broadcast_to(vec.sum(-1, keepdims=True) * 1e-3,
                                        (vec.shape[0], f))

            def loss_fn(params):
                variables = {"params": params}
                logits = model.apply(variables, corrupted, method=head_bc,
                                     train=True, rngs={"dropout": k_drop})
                per = bce_with_logits(logits, labels)
                denom = jnp.maximum(batch["weight"].sum(), 1.0) * f
                return (per * batch["weight"][:, None]).sum() / denom

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            new_state = ts._update(tx, state, grads, state.batch_stats)
            return new_state, {"loss": loss}

        results["no_head"] = timeit(
            jax.jit(step_nh, donate_argnums=(0,)), fresh(), batch)
        print(f"no_head       {results['no_head']*1e3:7.2f} ms", flush=True)

    if "sup" in which:
        sup_cfg = bp.base_config(v, f, idx_low, idx_high, pretrain=False,
                                 field_blocked_lookup=True)
        sup_model = models.from_config(sup_cfg)
        sup_tx, _ = build_optimizer(args, 10_000, 0)
        sup_state = ts.create_train_state(sup_model, sup_cfg, args, sup_tx,
                                          jax.random.PRNGKey(0), batch)
        sup_step, _ = ts.make_supervised_steps(sup_model, sup_cfg, args,
                                               sup_tx, base_rng)
        results["sup"] = timeit(
            sup_step, sup_state,
            {k: batch[k] for k in ("input_ids", "labels", "weight")})
        print(f"sup           {results['sup']*1e3:7.2f} ms", flush=True)

    if {"full", "precorrupt"} <= results.keys():
        print(f"  corrupt (full-precorrupt): "
              f"{(results['full']-results['precorrupt'])*1e3:6.2f} ms")
    if {"full", "no_head"} <= results.keys():
        print(f"  head (full-no_head):       "
              f"{(results['full']-results['no_head'])*1e3:6.2f} ms")
    if {"full", "sup"} <= results.keys():
        print(f"  vs supervised:             "
              f"{(results['full']-results['sup'])*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
