"""Ablation breakdown of the MFP per-field-shared step (the recommended
pretrain mode, VERDICT round-3 next #1: 11.89 ms -> target <= 6.9 ms).

Each variant is a separately-jitted step at the canonical geometry
(B=4096, F=24, M=7, k=25, proj=32, V~1M, bf16 tower); costs are read off by
DIFFERENCES between variants:

  full        - production make_mfp_steps step (reference point)
  no_opt      - fwd+bwd, no optimizer update        (full - no_opt = AdamW)
  fwd         - loss only, no grad                  (no_opt - fwd = backward)
  precorrupt  - corruption hoisted to host inputs   (full - precorrupt = corrupt)
  fixed_noise - per-field alias draw replaced by a constant (F,k) id set
                                                    (full - fixed_noise = draw)
  target_only - noise scoring (dense all-fields einsum + one-hot select)
                replaced by zeros                   (full - target_only = noise scoring)
  backbone    - supervised step at the same geometry (tower + input AdamW floor)

Usage: python benchmarks/bench_pf_parts.py [variant ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench_pretrain as bp  # geometry + config helpers


def timeit(step, state, batch, warmup=5, iters=30):
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def setup():
    import jax

    from map_tpu import models
    from map_tpu.config import TrainingArguments
    from map_tpu.objectives.alias import build_per_field_alias
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    b = 4096
    idx_low, idx_high, v = bp.geometry()
    rng = np.random.default_rng(0)
    probs = bp.unigram_probs(v, rng)
    cfg = bp.base_config(v, len(bp.FIELD_SIZES), idx_low, idx_high,
                         pretrain=True, pt_type="MFP", proj_size=32,
                         pt_neg_num=25, nce_loss_type="nce",
                         field_blocked_lookup=True)
    cfg.nce_grad = "dedup"
    args = TrainingArguments(
        output_dir="/tmp/bench_pf", learning_rate=1e-3, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.3, sampling_method="randint", pretrain=True,
        pt_type="MFP", pt_shared_noise=True, pt_per_field_noise=True)
    counts_pf = probs * 1e9
    lo64 = np.asarray(idx_low, np.int64)
    hi64 = np.asarray(idx_high, np.int64)
    pf_prob, pf_alias, logq, lnz = build_per_field_alias(counts_pf, lo64, hi64)
    cfg.logprob_noise = logq
    cfg.norm_term = lnz
    pf = (pf_prob, pf_alias, lo64.astype(np.int32),
          (hi64 - lo64).astype(np.int32), lnz)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 10_000, 0)
    batch = jax.device_put(bp.field_blocked_batch(rng, b, idx_low, idx_high))
    state = ts.create_train_state(model, cfg, args, tx,
                                  jax.random.PRNGKey(0), batch)
    return dict(model=model, cfg=cfg, args=args, tx=tx, state=state,
                batch=batch, pf=pf, b=b, idx_low=idx_low, idx_high=idx_high,
                v=v)


def pf_loss_fns(env):
    """Local mirror of train_step._pf_shared_forward, parameterized for the
    ablations (kept in sync with map_tpu/train/train_step.py)."""
    import jax
    import jax.numpy as jnp

    from map_tpu.objectives import corruption
    from map_tpu.objectives.alias import (
        build_fused_alias, per_field_alias_draw_logq)
    from map_tpu.objectives.nce import nce_loss

    model, cfg, args = env["model"], env["cfg"], env["args"]
    pf_prob, pf_alias, pf_lo, pf_sizes, pf_lnz = env["pf"]
    fused_tab = jnp.asarray(build_fused_alias(pf_prob, pf_alias,
                                              cfg.logprob_noise))
    pf_lo_j = jnp.asarray(pf_lo)
    pf_sizes_j = jnp.asarray(pf_sizes)
    pf_lnz_j = jnp.asarray(pf_lnz, jnp.float32)
    logq_j = jnp.asarray(cfg.logprob_noise, jnp.float32)
    mask_num = corruption.mask_num_of(cfg.num_fields, args.mask_ratio)
    k = int(cfg.pt_neg_num)
    F = int(cfg.num_fields)

    def loss_of(params, batch_stats, batch, rng, *, corrupt=True,
                draw=True, noise_scoring=True, sg=None):
        k_mask, k_noise, k_drop = jax.random.split(rng, 3)
        if corrupt:
            corrupted, labels, masked_index = corruption.mfp_corrupt(
                k_mask, batch["input_ids"], mask_num, args.sampling_method,
                input_size=int(cfg.input_size))
        else:
            corrupted = batch["corrupted"]
            labels = batch["mfp_labels"]
            masked_index = batch["masked_index"]
        if draw:
            all_fields = jnp.arange(F, dtype=jnp.int32)
            noise_f, noise_logq_f = per_field_alias_draw_logq(
                k_noise, fused_tab, pf_lo_j, pf_sizes_j, all_fields, k)
        else:
            noise_f = batch["noise_f"]
            noise_logq_f = batch["noise_logq_f"]
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if sg == "noise_gather":
            # A/B: noise scores via a (24,)-source row gather of each
            # position's field noise set, instead of the dense all-fields
            # bmfk einsum + one-hot select
            def ng_scoring(mdl, input_ids, masked_index, target_idx, nf,
                           train=True):
                c = mdl.config
                final_vec = mdl.backbone(input_ids, True)
                b_ = final_vec.shape[0]
                enc = mdl.feat_encoder(final_vec).reshape(
                    b_, c.num_fields, c.proj_size)
                sel = mdl._select_masked(enc, masked_index)
                ts_ = mdl.mfp_decoder._target_scores(sel, target_idx)
                n_flat, nb_flat = mdl.mfp_decoder._lookup_rows(nf.reshape(-1))
                f_, k_ = nf.shape
                n_rows = n_flat.reshape(f_, k_, -1)
                n_bias = nb_flat.reshape(f_, k_)
                nr = jnp.take(n_rows, masked_index, axis=0)   # (B,M,k,E)
                nb = jnp.take(n_bias, masked_index, axis=0)   # (B,M,k)
                ns = jnp.einsum("bme,bmke->bmk", sel, nr) + nb
                return jnp.concatenate([ts_[..., None], ns], axis=-1)

            logits = model.apply(
                variables, corrupted, masked_index, labels, noise_f,
                method=ng_scoring, train=True, rngs={"dropout": k_drop})
        elif sg is not None:
            # stop-gradient ablations: mirror per_field_shared_noise_logits
            # with either the decoder lookups ('decoder') or the tower
            # ('tower') cut out of the backward
            def sg_scoring(mdl, input_ids, masked_index, target_idx, nf,
                           train=True):
                c = mdl.config
                final_vec = mdl.backbone(input_ids, True)
                if sg == "tower":
                    final_vec = jax.lax.stop_gradient(final_vec)
                b_ = final_vec.shape[0]
                enc = mdl.feat_encoder(final_vec).reshape(
                    b_, c.num_fields, c.proj_size)
                sel = jnp.take_along_axis(enc, masked_index[..., None], axis=1)
                t_rows, t_bias = mdl.mfp_decoder._lookup_rows(target_idx)
                n_flat, nb_flat = mdl.mfp_decoder._lookup_rows(nf.reshape(-1))
                if sg == "decoder":
                    t_rows = jax.lax.stop_gradient(t_rows)
                    t_bias = jax.lax.stop_gradient(t_bias)
                    n_flat = jax.lax.stop_gradient(n_flat)
                    nb_flat = jax.lax.stop_gradient(nb_flat)
                f_, k_ = nf.shape
                ts_ = jnp.einsum("bme,bme->bm", sel, t_rows) + t_bias
                n_rows = n_flat.reshape(f_, k_, -1)
                n_bias = nb_flat.reshape(f_, k_)
                all_scores = jnp.einsum("bme,fke->bmfk", sel, n_rows) + n_bias
                oh = jax.nn.one_hot(masked_index, f_, dtype=all_scores.dtype)
                ns = jnp.einsum("bmfk,bmf->bmk", all_scores, oh)
                return jnp.concatenate([ts_[..., None], ns], axis=-1)

            logits = model.apply(
                variables, corrupted, masked_index, labels, noise_f,
                method=sg_scoring, train=True, rngs={"dropout": k_drop})
        elif noise_scoring:
            logits = model.apply(
                variables, corrupted, masked_index, labels, noise_f,
                method=model.mfp_per_field_shared_logits, train=True,
                rngs={"dropout": k_drop})
        else:
            # target-score only: backbone + feat_encoder + target lookup
            def target_only(mdl, input_ids, masked_index, target_idx,
                            train=True):
                c = mdl.config
                final_vec = mdl.backbone(input_ids, True)
                b_ = final_vec.shape[0]
                enc = mdl.feat_encoder(final_vec).reshape(
                    b_, c.num_fields, c.proj_size)
                sel = jnp.take_along_axis(enc, masked_index[..., None], axis=1)
                t_rows, t_bias = mdl.mfp_decoder._lookup_rows(target_idx)
                ts_ = jnp.einsum("bme,bme->bm", sel, t_rows) + t_bias
                return jnp.concatenate(
                    [ts_[..., None],
                     jnp.zeros(ts_.shape + (k,), ts_.dtype)], axis=-1)

            logits = model.apply(
                variables, corrupted, masked_index, labels,
                method=target_only, train=True, rngs={"dropout": k_drop})
        target_logq = jnp.take(logq_j, labels)
        onehot = jax.nn.one_hot(masked_index, F, dtype=noise_logq_f.dtype)
        noise_logq = jnp.einsum("fk,bmf->bmk", noise_logq_f, onehot)
        cand_logq = jnp.concatenate([target_logq[..., None], noise_logq],
                                    axis=-1)
        norm = jnp.take(pf_lnz_j, labels)[..., None]
        per_pos = nce_loss(logits, cand_logq, norm, k)
        denom = jnp.maximum(batch["weight"].sum(), 1.0) * mask_num
        return (per_pos * batch["weight"][:, None]).sum() / denom

    return loss_of, mask_num, k


def main():
    import jax
    import jax.numpy as jnp

    from map_tpu.objectives import corruption
    from map_tpu.objectives.alias import (
        build_fused_alias, per_field_alias_draw_logq)
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import apply_updates

    which = set(sys.argv[1:]) or {
        "full", "no_opt", "fwd", "precorrupt", "fixed_noise", "target_only",
        "backbone", "sg_decoder", "sg_tower"}
    env = setup()
    model, cfg, args, tx = env["model"], env["cfg"], env["args"], env["tx"]
    batch = env["batch"]
    # every variant donates its state; rebuild from a host copy per variant
    host_state = jax.device_get(env["state"])
    del env["state"]

    def fresh_state():
        return jax.device_put(host_state)
    loss_of, mask_num, k = pf_loss_fns(env)
    base_rng = jax.random.PRNGKey(1)
    results = {}

    def make_step(**abl):
        def step(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(params):
                return loss_of(params, state.batch_stats, batch, rng, **abl)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            new_state = ts._update(tx, state, grads, state.batch_stats)
            return new_state, {"loss": loss}

        return jax.jit(step, donate_argnums=(0,))

    if "full" in which:
        results["full"] = timeit(make_step(), fresh_state(), batch)
        print(f"full          {results['full']*1e3:7.2f} ms", flush=True)

    if "no_opt" in which:
        def step_no_opt(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(params):
                return loss_of(params, state.batch_stats, batch, rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            gnorm = sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
            new_state = state.replace(step=state.step + 1)
            return new_state, {"loss": loss + 1e-30 * gnorm}

        results["no_opt"] = timeit(jax.jit(step_no_opt, donate_argnums=(0,)),
                                   fresh_state(), batch)
        print(f"no_opt        {results['no_opt']*1e3:7.2f} ms", flush=True)

    if "fwd" in which:
        def step_fwd(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            loss = loss_of(state.params, state.batch_stats, batch, rng)
            return state.replace(step=state.step + 1), {"loss": loss}

        results["fwd"] = timeit(jax.jit(step_fwd, donate_argnums=(0,)),
                                fresh_state(), batch)
        print(f"fwd           {results['fwd']*1e3:7.2f} ms", flush=True)

    if "precorrupt" in which:
        rng0 = np.random.default_rng(7)
        b = env["b"]
        c_np, l_np, m_np = jax.device_get(corruption.mfp_corrupt(
            jax.random.PRNGKey(9), jnp.asarray(batch["input_ids"]),
            mask_num, args.sampling_method))
        pb = dict(batch, corrupted=jnp.asarray(c_np),
                  mfp_labels=jnp.asarray(l_np),
                  masked_index=jnp.asarray(m_np))
        results["precorrupt"] = timeit(make_step(corrupt=False), fresh_state(), pb)
        print(f"precorrupt    {results['precorrupt']*1e3:7.2f} ms", flush=True)

    if "fixed_noise" in which:
        pf_prob, pf_alias, pf_lo, pf_sizes, pf_lnz = env["pf"]
        fused_tab = jnp.asarray(build_fused_alias(
            pf_prob, pf_alias, cfg.logprob_noise))
        nf, nlq = per_field_alias_draw_logq(
            jax.random.PRNGKey(3), fused_tab, jnp.asarray(pf_lo),
            jnp.asarray(pf_sizes), jnp.arange(int(cfg.num_fields), dtype=jnp.int32), k)
        fb = dict(batch, noise_f=nf, noise_logq_f=nlq)
        results["fixed_noise"] = timeit(make_step(draw=False), fresh_state(), fb)
        print(f"fixed_noise   {results['fixed_noise']*1e3:7.2f} ms", flush=True)

    if "target_only" in which:
        results["target_only"] = timeit(make_step(noise_scoring=False),
                                        fresh_state(), batch)
        print(f"target_only   {results['target_only']*1e3:7.2f} ms", flush=True)

    if "noise_gather" in which:
        results["noise_gather"] = timeit(make_step(sg="noise_gather"),
                                         fresh_state(), batch)
        print(f"noise_gather  {results['noise_gather']*1e3:7.2f} ms", flush=True)

    if "sg_decoder" in which:
        results["sg_decoder"] = timeit(make_step(sg="decoder"),
                                       fresh_state(), batch)
        print(f"sg_decoder    {results['sg_decoder']*1e3:7.2f} ms", flush=True)

    if "sg_tower" in which:
        results["sg_tower"] = timeit(make_step(sg="tower"),
                                     fresh_state(), batch)
        print(f"sg_tower      {results['sg_tower']*1e3:7.2f} ms", flush=True)

    if "backbone" in which:
        # supervised step at the same geometry = tower + input-table AdamW floor
        from map_tpu.config import TrainingArguments as TA
        sup_cfg = bp.base_config(env["v"], len(bp.FIELD_SIZES),
                                 env["idx_low"], env["idx_high"],
                                 pretrain=False, field_blocked_lookup=True)
        sup_args = TA(output_dir="/tmp/bench_pf_sup", learning_rate=1e-3,
                      weight_decay=0.05, lr_sched="const", warmup_ratio=0.0,
                      max_grad_norm=0.0)
        from map_tpu import models as mdls
        sup_model = mdls.from_config(sup_cfg)
        from map_tpu.train.optimizer import build_optimizer
        sup_tx, _ = build_optimizer(sup_args, 10_000, 0)
        sup_state = ts.create_train_state(sup_model, sup_cfg, sup_args,
                                          sup_tx, jax.random.PRNGKey(0),
                                          batch)
        sup_step, _ = ts.make_supervised_steps(sup_model, sup_cfg, sup_args,
                                               sup_tx, jax.random.PRNGKey(1))
        results["backbone"] = timeit(sup_step, sup_state,
                                     {kk: batch[kk] for kk in
                                      ("input_ids", "labels", "weight")})
        print(f"backbone(sup) {results['backbone']*1e3:7.2f} ms", flush=True)

    if {"full", "no_opt", "fwd"} <= results.keys():
        print(f"\n  optimizer (full-no_opt):   "
              f"{(results['full']-results['no_opt'])*1e3:6.2f} ms")
        print(f"  backward (no_opt-fwd):     "
              f"{(results['no_opt']-results['fwd'])*1e3:6.2f} ms")
    for nm, ref in (("precorrupt", "corrupt"), ("fixed_noise", "draw"),
                    ("target_only", "noise-scoring")):
        if nm in results and "full" in results:
            print(f"  {ref} (full-{nm}): "
                  f"{(results['full']-results[nm])*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
