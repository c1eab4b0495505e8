"""MFP pretrain step timing A/B: XLA vs Pallas scatter backward for the NCE
decoder table (B*M*(1+k) ~ 745k candidate rows per canonical batch — 7.6x the
input-table scatter). Run on hardware."""

from __future__ import annotations

import time

import numpy as np

import jax


def run_variant(name, fast_grad, shared_noise=False, nce_grad="xla",
                ids_dist="zipf", per_field=False, packed=False):
    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.objectives.alias import build_alias_table, noise_distribution
    from map_tpu.ops import embedding as emb_ops
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    emb_ops.FAST_GRAD_ENABLED = fast_grad
    b, f, v = 4096, 24, 1_000_000
    rng = np.random.default_rng(0)
    if ids_dist == "zipf":
        # realistic CTR unigram: power-law feature frequencies (the
        # preprocessing id space is ordered arbitrarily within fields, but the
        # FREQUENCY distribution of ids in batches is Zipf-like)
        counts = (1.0 / np.arange(1, v + 1) ** 1.1)
        rng.shuffle(counts)
        probs = noise_distribution(counts)
    else:
        probs = noise_distribution(rng.random(v) + 0.1)
    cfg = Config(model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
                 hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
                 hidden_dropout_rate=0.0, num_cross_layers=3, pretrain=True,
                 pt_type="MFP", proj_size=32, pt_neg_num=25,
                 nce_loss_type="nce", embed_norm=False, layer_norm_eps=1e-12,
                 embed_dropout_rate=0.0, use_pallas=False,
                 packed_tables=packed)
    cfg.nce_grad = nce_grad
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(v))
    args = TrainingArguments(output_dir="/tmp/mfp_ab", learning_rate=1e-3,
                             weight_decay=0.05, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0,
                             mask_ratio=0.3, sampling_method="randint",
                             pretrain=True, pt_type="MFP",
                             pt_shared_noise=shared_noise)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    if ids_dist == "zipf":
        ids_np = rng.choice(v, size=(b, f), p=probs).astype(np.int32)
    else:
        ids_np = np.asarray(rng.integers(10, v, (b, f)), np.int32)
    batch = jax.device_put({
        "input_ids": ids_np,
        "labels": np.zeros(b, np.float32),
        "weight": np.ones(b, np.float32)})
    pf = None
    if per_field:
        from map_tpu.objectives.alias import build_per_field_alias

        counts_pf = (probs * 1e9)
        idx_low = (np.arange(f) * (v // f)).astype(np.int64)
        idx_high = idx_low + v // f
        pf_prob, pf_alias, logq, lnz = build_per_field_alias(
            counts_pf, idx_low, idx_high)
        cfg.logprob_noise = logq
        sizes = (idx_high - idx_low).astype(np.int32)
        pf = (pf_prob, pf_alias, idx_low.astype(np.int32), sizes, lnz)
        prob_t, alias_t = pf_prob, pf_alias
    else:
        prob_t, alias_t = build_alias_table(probs)
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    step, _ = ts.make_mfp_steps(model, cfg, args, tx, jax.random.PRNGKey(1),
                                prob_t, alias_t, cfg.logprob_noise,
                                per_field=pf)
    for _ in range(5):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        state, m = step(state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 30
    print(f"MFP {name:22s} {dt * 1e3:7.2f} ms/step  {b / dt:10.0f} ex/s",
          flush=True)


def main():
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("xla", "both"):
        run_variant("xla-scatter", False)
    if which in ("dedup", "both"):
        run_variant("dedup-scatter", False, nce_grad="dedup")
    if which in ("dedup-packed", "packed"):
        run_variant("dedup-packed", False, nce_grad="dedup", packed=True)
    if which in ("shared-packed",):
        run_variant("shared-packed", False, shared_noise=True, packed=True)
    if which == "dedup-pallas":
        run_variant("dedup-pallas", False, nce_grad="dedup_pallas")
    if which == "dedup-uniform":
        run_variant("dedup-scatter-uniform", False, nce_grad="dedup",
                    ids_dist="uniform")
    if which == "pallas":
        run_variant("pallas-scatter", True)
    if which == "shared":
        run_variant("shared-noise", False, shared_noise=True)
    if which == "pf-shared":
        run_variant("per-field-shared", False, shared_noise=True,
                    per_field=True)


if __name__ == "__main__":
    main()
