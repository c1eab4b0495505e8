"""Capture an op-level device trace of the pf-shared MFP step (the round-5
decomposition tool: benchmarks/xplane_summary.py aggregates the result).

Usage: python benchmarks/profile_pf.py [--k100] [--dedup] [--sparse]
"""

import sys

sys.path.insert(0, "/root/repo")

import bench_pretrain as bp  # noqa: E402


def main():
    import jax
    import numpy as np

    from map_tpu import models
    from map_tpu.config import TrainingArguments
    from map_tpu.objectives.alias import build_per_field_alias
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    b = 4096
    idx_low, idx_high, v = bp.geometry()
    rng = np.random.default_rng(0)
    probs = bp.unigram_probs(v, rng)
    k_neg = 100 if "--k100" in sys.argv else 25
    cfg = bp.base_config(v, len(bp.FIELD_SIZES), idx_low, idx_high,
                         pretrain=True, pt_type="MFP", proj_size=32,
                         pt_neg_num=k_neg, nce_loss_type="nce",
                         field_blocked_lookup=True)
    if "--dedup" in sys.argv:
        cfg.nce_grad = "dedup"
    args = TrainingArguments(
        output_dir="/tmp/prof_pf", learning_rate=1e-3, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.3, sampling_method="randint", pretrain=True,
        pt_type="MFP", pt_shared_noise=True, pt_per_field_noise=True)
    counts_pf = probs * 1e9
    lo64 = np.asarray(idx_low, np.int64)
    hi64 = np.asarray(idx_high, np.int64)
    pf_prob, pf_alias, logq, lnz = build_per_field_alias(counts_pf, lo64,
                                                         hi64)
    cfg.logprob_noise = logq
    cfg.norm_term = lnz
    pf = (pf_prob, pf_alias, lo64.astype(np.int32),
          (hi64 - lo64).astype(np.int32), lnz)
    if "--sparse" in sys.argv:
        from map_tpu.ops import sparse_adamw

        sparse_adamw.enable(True)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    batch = jax.device_put(bp.field_blocked_batch(rng, b, idx_low, idx_high))
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                                  batch)
    step, _ = ts.make_mfp_steps(model, cfg, args, tx, jax.random.PRNGKey(1),
                                pf_prob, pf_alias, cfg.logprob_noise,
                                per_field=pf)
    for _ in range(6):  # warm + settle
        state, m = step(state, batch)
    float(m["loss"])
    out = "/tmp/prof_pf_trace"
    jax.profiler.start_trace(out)
    for _ in range(8):
        state, m = step(state, batch)
    float(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace -> {out} (8 steps)")

    from xplane_summary import summarize

    summarize(out, 40)


if __name__ == "__main__":
    main()
