"""Pretrain throughput benchmark: MFP (per-position and per-field-shared)
and RFD steps at the canonical config, on the same field-blocked Avazu-like
geometry as bench.py.

Prints one JSON line per mode:
  {"metric": ..., "value": ex/s, "unit": "examples/s", "vs_baseline": ...}

Reference-GPU denominators (the reference publishes no numbers — BASELINE.md;
these are engineering estimates built the same way as bench.py's 400k
supervised estimate, stated here so the arithmetic is checkable):

- MFP per-position (per_word=True, the reference default,
  `code/nce/nce_loss.py:146-156`): per 4096-row batch the reference does
  host-side dynamic_mask (per-row randperm/randint + gather/scatter on CPU,
  `code/trainer.py:217-232`, ~3-5 ms in python+torch-CPU), moves ids+labels+
  masked_index H2D, draws B*M*k ~ 717k alias samples, index_selects
  B*M*(1+k) ~ 745k rows x (32+1) from the decoder tables and scatter-adds
  the same stream back (atomic index_add on GPU, ~2-4 ms), plus the
  DCNv2 tower fwd/bwd and dense AdamW over the 1M x 16 input and 1M x 32
  decoder tables (~4 ms at V100-class HBM). Estimated total ~20 ms/step
  => ~200k examples/s. MFP_VS = 200_000.
- RFD (Unigram generator): device side is near-supervised (per-field BCE
  head, no candidate gathers) but the host corruption is heavier than
  supervised loading (random-row reads of the in-RAM train matrix + compare,
  `code/trainer.py:233-260`, ~3-4 ms/batch on top of the ~10 ms
  DataLoader-bound supervised floor) => ~300k examples/s. RFD_VS = 300_000.
- MFP per-field-shared is a TPU-native mode with no reference counterpart
  (field-conditional negatives at shared-noise speed); it is scored against
  the same per-position MFP denominator, since it replaces that stage.

Usage: python bench_pretrain.py [mfp|pf|rfd|all]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

MFP_VS = 200_000.0
RFD_VS = 300_000.0

# bench.py's 5-core-Avazu-shaped field cardinalities (24 fields, ~1M ids)
FIELD_SIZES = [7, 7, 24, 26, 4100, 7600, 26, 8500, 560, 36, 8200, 5, 4,
               2600, 8, 450, 70, 170, 60, 101_000, 380_000, 500_000, 30, 26]


def geometry():
    idx_low, lo = [], 10
    for s in FIELD_SIZES:
        idx_low.append(lo)
        lo += s
    idx_high = idx_low[1:] + [lo]
    return idx_low, idx_high, lo


def base_config(v, f, idx_low, idx_high, **kw):
    from map_tpu.config import Config

    kw.setdefault("compute_dtype",
                  "float32" if "--f32" in sys.argv else "bfloat16")
    return Config(
        model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
        hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
        hidden_dropout_rate=0.0, num_cross_layers=3,
        embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
        use_pallas=False, packed_tables=True, fused_table_update=True,
        idx_low=idx_low, idx_high=idx_high, **kw)


def unigram_probs(v, rng):
    """Zipf-like feature frequencies (the realistic CTR unigram shape)."""
    from map_tpu.objectives.alias import noise_distribution

    counts = 1.0 / np.arange(1, v + 1) ** 1.1
    rng.shuffle(counts)
    return noise_distribution(counts)


def field_blocked_batch(rng, b, idx_low, idx_high):
    ids = np.stack([rng.integers(a, h, b)
                    for a, h in zip(idx_low, idx_high)], axis=1)
    return {
        "input_ids": ids.astype(np.int32),
        "labels": rng.integers(0, 2, b).astype(np.float32),
        "weight": np.ones(b, np.float32),
    }


def timeit(step, state, batch, warmup=5, iters=30, trials=5):
    """Best-of-trials (bench.py discipline): the tunnel has hours-scale speed
    phases and the noise is one-sided — a drained window can't beat true
    device speed — so the minimum is the honest per-chip number."""
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])  # host fetch = the only reliable barrier on the tunnel
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_mfp(per_field_shared: bool):
    import jax

    from map_tpu import models
    from map_tpu.config import TrainingArguments
    from map_tpu.objectives.alias import (
        build_alias_table, build_per_field_alias)
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    b = 4096
    idx_low, idx_high, v = geometry()
    rng = np.random.default_rng(0)
    probs = unigram_probs(v, rng)
    k_neg = 100 if (per_field_shared and "--k100" in sys.argv) else 25
    cfg = base_config(v, len(FIELD_SIZES), idx_low, idx_high,
                      pretrain=True, pt_type="MFP", proj_size=32,
                      pt_neg_num=k_neg, nce_loss_type="nce",
                      # corrupted ids contain <mask>=3 only (in-contract);
                      # field-blocked lookup stays on, as in production
                      field_blocked_lookup=True)
    if "--dedup" in sys.argv:  # A/B: pre-round-5 score-fused target path
        cfg.nce_grad = "dedup"
    import os as _os

    if not _os.environ.get("MAP_TPU_HYBRID_MODE"):
        cfg.hybrid_mode = "matmul"  # production MFP default (build_config)
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(v))
    args = TrainingArguments(
        output_dir="/tmp/bench_pt", learning_rate=1e-3, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.3, sampling_method="randint", pretrain=True,
        pt_type="MFP", pt_shared_noise=per_field_shared,
        pt_per_field_noise=per_field_shared)
    if "--sparse" in sys.argv:  # A/B: sparse-stream decoder AdamW
        from map_tpu.ops import sparse_adamw

        sparse_adamw.enable(True)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    batch = jax.device_put(field_blocked_batch(rng, b, idx_low, idx_high))
    pf = None
    if per_field_shared:
        counts_pf = probs * 1e9
        lo64 = np.asarray(idx_low, np.int64)
        hi64 = np.asarray(idx_high, np.int64)
        pf_prob, pf_alias, logq, lnz = build_per_field_alias(
            counts_pf, lo64, hi64)
        cfg.logprob_noise = logq
        pf = (pf_prob, pf_alias, lo64.astype(np.int32),
              (hi64 - lo64).astype(np.int32), lnz)
        prob_t, alias_t = pf_prob, pf_alias
    else:
        prob_t, alias_t = build_alias_table(probs)
    state = ts.create_train_state(model, cfg, args, tx,
                                  jax.random.PRNGKey(0), batch)
    step, _ = ts.make_mfp_steps(model, cfg, args, tx, jax.random.PRNGKey(1),
                                prob_t, alias_t, cfg.logprob_noise,
                                per_field=pf)
    dt = timeit(step, state, batch)
    name = ("mfp_per_field_shared_examples_per_sec_per_chip"
            if per_field_shared else
            "mfp_per_position_examples_per_sec_per_chip")
    print(json.dumps({
        "metric": name, "value": round(b / dt, 1), "unit": "examples/s",
        "vs_baseline": round(b / dt / MFP_VS, 3)}), flush=True)
    print(f"  {name}: {dt * 1e3:.2f} ms/step", file=sys.stderr)


def bench_rfd():
    import jax

    from map_tpu import models
    from map_tpu.config import TrainingArguments
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    b = 4096
    idx_low, idx_high, v = geometry()
    rng = np.random.default_rng(0)
    cfg = base_config(v, len(FIELD_SIZES), idx_low, idx_high,
                      pretrain=True, pt_type="RFD", proj_size=32,
                      # Unigram replacement keeps ids inside their field
                      # blocks (values come from other training rows), so
                      # the hybrid lookup stays on — run.py's gate only
                      # disables it for Whole-* generators
                      field_blocked_lookup=True)
    args = TrainingArguments(
        output_dir="/tmp/bench_pt", learning_rate=1e-3, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.3, sampling_method="randint", pretrain=True,
        pt_type="RFD", RFD_replace="Unigram")
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    np_batch = field_blocked_batch(rng, b, idx_low, idx_high)
    # RFD-Unigram replacement rows ride the input pipeline (a second shuffled
    # view of the train matrix, one row per masked position); the bench
    # models them with random field-blocked rows
    mask_num = int(len(FIELD_SIZES) * 0.3)
    np_batch["noise_rows"] = field_blocked_batch(
        rng, b * mask_num, idx_low, idx_high)["input_ids"]
    batch = jax.device_put(np_batch)
    state = ts.create_train_state(model, cfg, args, tx,
                                  jax.random.PRNGKey(0), batch)
    step, _ = ts.make_rfd_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    dt = timeit(step, state, batch)
    print(json.dumps({
        "metric": "rfd_examples_per_sec_per_chip",
        "value": round(b / dt, 1), "unit": "examples/s",
        "vs_baseline": round(b / dt / RFD_VS, 3)}), flush=True)
    print(f"  rfd: {dt * 1e3:.2f} ms/step", file=sys.stderr)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mfp", "all"):
        bench_mfp(False)
    if which in ("pf", "all"):
        bench_mfp(True)
    if which in ("rfd", "all"):
        bench_rfd()


if __name__ == "__main__":
    main()
