"""Jitted train/eval steps for the three objectives.

Everything the reference does per batch on host+device
(`code/trainer.py:118-154, 302-331, 427-455`: corruption, noise sampling,
forward, loss, backward, clip, AdamW update, schedule step) is fused here into
ONE jitted XLA program per objective. Static shapes throughout (mask_num and
the candidate count are Python constants), no data-dependent control flow, and
the RNG is an on-device threefry stream folded with the step counter.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from map_tpu.objectives import corruption
from map_tpu.objectives.alias import alias_draw
from map_tpu.objectives.nce import (
    bce_with_logits,
    full_ce_loss,
    mfp_accuracy_count,
    nce_loss,
    sampled_softmax_loss,
)
from map_tpu.objectives.supervised import bce_loss


def make_multi_step(step_fn, num_steps: int):
    """Fuse `num_steps` sequential train steps into ONE device dispatch via
    lax.scan over a stacked batch (leading axis = step). Amortizes per-dispatch
    and host->device overhead — essential on high-latency links (the axon
    tunnel costs ~1.2 ms per dispatch and ~10 ms per un-prefetched batch
    transfer, dwarfing the 9.5 ms compute step).

    stacked_batch: pytree whose leaves have leading dim num_steps. Returns
    (state, stacked_metrics).
    """

    def multi(state, stacked_batch):
        def body(s, b):
            return step_fn(s, b)

        return jax.lax.scan(body, state, stacked_batch)

    return jax.jit(multi, donate_argnums=(0,))


def _resident_batch(batch, data, batch_size=None):
    """Rebuild the full step batch from an index batch + the HBM-resident
    train data: `input_ids = x[index]`, `labels = y[index]` (and RFD
    `noise_rows = x[noise_index]`) gathered ON DEVICE; the padding-mask
    weight is rebuilt from the scalar real_count. The per-step host->device
    transfer drops from the (B, F) id block + labels + weight (~430 KB, +
    ~2.7 MB RFD noise rows at the canonical config) to the index vector
    (~16 KB) — decisive on high-latency / low-bandwidth links like the axon
    tunnel, where the id-block transfer gated the e2e trainer at ~46% of the
    device step (PERFORMANCE.md round 3).

    Stream v2 (round 4): when the EPOCH's shuffled order is itself device-
    resident (data["perm"], uploaded once per epoch — trainer
    _ensure_epoch_perm), the batch carries only a scalar batch number and
    the index block is a dynamic_slice of the resident permutation: the
    per-step transfer drops to a few scalars. Same host-computed
    permutation, so the stream is bit-identical to the index/host
    pipelines."""
    full = {k: v for k, v in batch.items()
            if k not in ("index", "noise_index", "real_count",
                         "labels", "weight", "start")}
    if "start" in batch:
        assert batch_size is not None
        idx = jax.lax.dynamic_slice(
            data["perm"], (batch["start"] * batch_size,), (batch_size,))
    else:
        idx = batch["index"]
    full["input_ids"] = jnp.take(data["x"], idx, axis=0)
    full["labels"] = jnp.take(data["y"], idx)
    # global positions >= real_count are padding (loader.py pads with row 0)
    full["weight"] = (jax.lax.iota(jnp.int32, idx.shape[0])
                      < batch["real_count"]).astype(jnp.float32)
    if "noise_index" in batch:
        full["noise_rows"] = jnp.take(data["x"], batch["noise_index"], axis=0)
    return full


def make_resident_step(step_fn, batch_size=None):
    """(state, index_batch, data) version of a train step; `data` holds the
    device-resident train matrix {"x": (N, F) int32} and is NOT donated.
    batch_size: static, required for the stream-v2 scalar-start batches."""

    def step(state, batch, data):
        return step_fn(state, _resident_batch(batch, data, batch_size))

    return jax.jit(step, donate_argnums=(0,))


def make_resident_multi_step(step_fn, num_steps: int, batch_size=None):
    """Resident-data twin of make_multi_step (scan over stacked index
    batches)."""

    def multi(state, stacked_batch, data):
        def body(s, b):
            return step_fn(s, _resident_batch(b, data, batch_size))

        return jax.lax.scan(body, state, stacked_batch)

    return jax.jit(multi, donate_argnums=(0,))


def make_multi_eval(eval_fn, has_rng: bool = False):
    """Fuse a stack of eval batches into ONE device dispatch via lax.scan
    (the eval twin of make_multi_step; reference evals dispatch per batch,
    `code/trainer.py:177-186`).

    stacked_batch: pytree with leading dim = number of batches; returns the
    per-batch metrics stacked on that axis. With has_rng=True the returned
    callable is (state, stacked_batch, rng, start_index) and folds
    `rng ⊕ (start_index + i)` for batch i — bit-identical to the unstacked
    per-batch `fold_in(rng, global_batch_index)` stream.
    """
    if has_rng:
        def multi(state, stacked_batch, rng, start_index):
            def body(i, b):
                return i + 1, eval_fn(state, b, jax.random.fold_in(rng, i))

            _, ms = jax.lax.scan(body, jnp.asarray(start_index, jnp.int32),
                                 stacked_batch)
            return ms

        return jax.jit(multi)

    def multi(state, stacked_batch):
        def body(c, b):
            return c, eval_fn(state, b)

        _, ms = jax.lax.scan(body, jnp.int32(0), stacked_batch)
        return ms

    return jax.jit(multi)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(model, config, args, tx, rng, sample_batch) -> TrainState:
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    kwargs = {}
    if getattr(config, "pretrain", False) and config.pt_type == "MFP":
        b, f = sample_batch["input_ids"].shape
        m = corruption.mask_num_of(config.num_fields, args.mask_ratio)
        kwargs = {
            "masked_index": jnp.zeros((b, m), jnp.int32),
            "candidates": jnp.zeros((b, m, 1 + config.pt_neg_num), jnp.int32),
        }
    variables = model.init(init_rngs, jnp.asarray(sample_batch["input_ids"]),
                           train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.asarray(0, jnp.int32))


def _apply_train(model, state: TrainState, params, inputs, dropout_rng, **kwargs):
    """Forward in train mode, threading batch_stats when present."""
    has_bs = bool(state.batch_stats)
    variables = {"params": params}
    if has_bs:
        variables["batch_stats"] = state.batch_stats
        out, mutated = model.apply(variables, inputs, train=True,
                                   rngs={"dropout": dropout_rng},
                                   mutable=["batch_stats"], **kwargs)
        return out, mutated["batch_stats"]
    out = model.apply(variables, inputs, train=True,
                      rngs={"dropout": dropout_rng}, **kwargs)
    return out, {}


def _apply_eval(model, variables, inputs, **kwargs):
    return model.apply(variables, inputs, train=False, **kwargs)


def _update(tx, state: TrainState, grads, new_batch_stats) -> TrainState:
    from map_tpu.train.optimizer import apply_updates

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    # optimizer.apply_updates == optax.apply_updates plus Replace-wrapper
    # support for PartitionedTx's fused table updates
    params = apply_updates(state.params, updates)
    return TrainState(params=params, batch_stats=new_batch_stats,
                      opt_state=opt_state, step=state.step + 1)


# ---------------------------------------------------------------------------
# Supervised CTR (scratch / finetune): reference trainer.py:87-161
# ---------------------------------------------------------------------------

def make_supervised_steps(model, config, args, tx, base_rng,
                          streaming_bins: int = 0):
    """streaming_bins > 0 switches the eval step to streaming mode: instead of
    per-example logits/probs it returns two score histograms plus exact scalar
    sums (log-loss, logit/prob sums, count), all O(bins) — no per-example
    device->host transfer. See utils.metrics.auc_from_histograms."""
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            logits, new_bs = _apply_train(model, state, params,
                                          batch["input_ids"], rng)
            loss = bce_loss(logits, batch["labels"], batch["weight"])
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _update(tx, state, grads, new_bs)
        probs = jax.nn.sigmoid(logits.reshape(-1))
        metrics = {"loss": loss, "probs": probs}
        return new_state, metrics

    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = _apply_eval(model, variables, batch["input_ids"]).reshape(-1)
        loss = bce_loss(logits, batch["labels"], batch["weight"])
        probs = jax.nn.sigmoid(logits)
        if not streaming_bins:
            # labels/weight ride along so the multi-host exact eval can
            # allgather them from the GLOBAL device batch (host-side
            # per-process labels would duplicate model-replica blocks when
            # replicas span processes — trainer.eval run_pass)
            return {"loss": loss, "logits": logits, "probs": probs,
                    "labels": batch["labels"], "weight": batch["weight"]}
        # streaming mode: O(bins) reduction on device. Padding rows carry
        # weight 0 and drop out of every sum/histogram.
        w = batch["weight"]
        y = batch["labels"]
        nb = int(streaming_bins)
        bucket = jnp.clip((probs * nb).astype(jnp.int32), 0, nb - 1)
        hist_pos = jnp.zeros(nb, jnp.float32).at[bucket].add(w * y)
        hist_neg = jnp.zeros(nb, jnp.float32).at[bucket].add(w * (1.0 - y))
        # exact per-example BCE from logits: softplus(x) - y*x (stable)
        per_ll = jnp.logaddexp(0.0, logits) - y * logits
        return {
            "loss": loss,
            "hist_pos": hist_pos,
            "hist_neg": hist_neg,
            "ll_sum": jnp.sum(w * per_ll),
            "logit_sum": jnp.sum(w * logits),
            "prob_sum": jnp.sum(w * probs),
            "count": jnp.sum(w),
        }

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


# ---------------------------------------------------------------------------
# MFP: masked feature prediction, reference trainer.py:268-391 + nce subsystem
# ---------------------------------------------------------------------------

def make_mfp_steps(model, config, args, tx, base_rng,
                   alias_prob, alias_alias, logprob_noise,
                   per_field=None):
    """per_field: optional (prob_all, alias_all, idx_low, field_sizes, lnz)
    enabling field-conditional candidate sampling (north-star upgrade);
    None = reference-parity global unigram noise."""
    mask_num = corruption.mask_num_of(config.num_fields, args.mask_ratio)
    k = int(config.pt_neg_num)
    loss_type = getattr(config, "nce_loss_type", "nce")
    from map_tpu.objectives.alias import (
        alias_draw_logq,
        build_fused_alias,
        per_field_alias_draw_logq,
    )

    # fused (V, 4) draw table: one gather yields noise ids AND their logq —
    # dynamic row gathers are per-row-priced on TPU, so this replaces three
    # full-candidate-stream gathers (prob, alias, loss logq) with one
    fused_tab = jnp.asarray(build_fused_alias(alias_prob, alias_alias,
                                              logprob_noise))
    alias_prob = jnp.asarray(alias_prob)
    alias_alias = jnp.asarray(alias_alias)
    logprob_noise = jnp.asarray(logprob_noise, jnp.float32)
    if per_field is not None:
        pf_prob, pf_alias, pf_lo, pf_sizes, pf_lnz = (jnp.asarray(x)
                                                      for x in per_field)
        # per-position lnZ = log(field size): a (F,)-table gather by masked
        # field, NOT the (V,)-table gather by target id (identical values —
        # alias.build_per_field_alias sets lnz[i] = log(size of field(i)) —
        # but 1-wide gathers from a 1M-row source are per-row priced)
        pf_logsize = jnp.log(pf_sizes.astype(jnp.float32))
        norm_term = None  # per-position, derived from the target's field
    else:
        norm_term = float(config.norm_term)

    def _corrupt_and_sample(rng, batch):
        k_mask, k_noise = jax.random.split(rng)
        corrupted, labels, masked_index = corruption.mfp_corrupt(
            k_mask, batch["input_ids"], mask_num, args.sampling_method,
            input_size=int(config.input_size))
        b = corrupted.shape[0]
        if per_field is not None:
            noise, noise_logq = per_field_alias_draw_logq(
                k_noise, fused_tab, pf_lo, pf_sizes, masked_index, k)
        else:
            noise, noise_logq = alias_draw_logq(k_noise, fused_tab,
                                                (b, mask_num, k))
        target_logq = jnp.take(logprob_noise, labels)  # (B, M): small gather
        candidates = jnp.concatenate([labels[..., None], noise], axis=-1)
        cand_logq = jnp.concatenate([target_logq[..., None], noise_logq],
                                    axis=-1)
        return corrupted, masked_index, candidates, cand_logq

    def _loss_from_logits(cand_logits, candidates, noise_logprobs, weight,
                          fields=None):
        if per_field is not None:
            # per-position lnZ = log(field size) of the target's field
            if fields is not None:
                norm = jnp.take(pf_logsize, fields)[..., None]
            else:
                norm = jnp.take(pf_lnz, candidates[:, :, 0])[..., None]
        else:
            norm = norm_term
        if loss_type == "nce":
            per_pos = nce_loss(cand_logits, noise_logprobs, norm, k)
        elif loss_type == "sampled":
            per_pos = sampled_softmax_loss(cand_logits, noise_logprobs, norm)
        else:
            raise NotImplementedError(loss_type)
        denom = jnp.maximum(weight.sum(), 1.0) * mask_num
        loss = (per_pos * weight[:, None]).sum() / denom
        return loss

    def _full_forward(state, params, corrupted, masked_index, labels, weight,
                      dropout_rng, train):
        """'full' mode: exact CE over the vocabulary (the reference's full
        mode is broken — SURVEY.md §5; functional here)."""
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = dict(method=model.mfp_full_scores, train=train)
        if train:
            kwargs["rngs"] = {"dropout": dropout_rng}
        if state.batch_stats and train:
            scores, mutated = model.apply(variables, corrupted, masked_index,
                                          mutable=["batch_stats"], **kwargs)
            new_bs = mutated["batch_stats"]
        else:
            scores = model.apply(variables, corrupted, masked_index, **kwargs)
            new_bs = state.batch_stats
        per_pos = full_ce_loss(scores, labels)
        denom = jnp.maximum(weight.sum(), 1.0) * mask_num
        loss = (per_pos * weight[:, None]).sum() / denom
        hit = (jnp.argmax(scores, axis=-1) == labels).astype(jnp.float32)
        acc_count = jnp.sum(hit * weight[:, None])
        return loss, acc_count, new_bs

    shared_noise = bool(getattr(args, "pt_shared_noise", False))

    def _shared_forward(state, params, batch, rng, train):
        """per_word=False: one k-noise set per step (nce_loss.py:152-153).
        Combined with per-field sampling: one k-noise set per FIELD per step
        (field-conditional negatives at per_word=False speed — TPU-native
        mode, no reference counterpart)."""
        if per_field is not None:
            return _pf_shared_forward(state, params, batch, rng, train)
        k_mask, k_noise, k_drop = jax.random.split(rng, 3)
        corrupted, labels, masked_index = corruption.mfp_corrupt(
            k_mask, batch["input_ids"], mask_num, args.sampling_method,
            input_size=int(config.input_size))
        noise = alias_draw(k_noise, alias_prob, alias_alias, (k,))
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = dict(method=model.mfp_shared_noise_logits, train=train)
        if train:
            kwargs["rngs"] = {"dropout": k_drop}
        if state.batch_stats and train:
            logits, mutated = model.apply(variables, corrupted, masked_index,
                                          labels, noise,
                                          mutable=["batch_stats"], **kwargs)
            new_bs = mutated["batch_stats"]
        else:
            logits = model.apply(variables, corrupted, masked_index, labels,
                                 noise, **kwargs)
            new_bs = state.batch_stats
        b = corrupted.shape[0]
        noise_bc = jnp.broadcast_to(noise[None, None, :], (b, mask_num, k))
        candidates = jnp.concatenate([labels[..., None], noise_bc], axis=-1)
        # logq: (k,) noise lookup broadcast + (B, M) target lookup — no
        # full-candidate-stream gather
        target_logq = jnp.take(logprob_noise, labels)
        noise_logq = jnp.broadcast_to(jnp.take(logprob_noise, noise)[None, None, :],
                                      (b, mask_num, k))
        cand_logq = jnp.concatenate([target_logq[..., None], noise_logq], axis=-1)
        loss = _loss_from_logits(logits, candidates, cand_logq, batch["weight"])
        acc_count = mfp_accuracy_count(logits, batch["weight"])
        return loss, acc_count, new_bs

    def _pf_shared_forward(state, params, batch, rng, train):
        """Per-field shared noise: draw (F, k) ids — one set per field — and
        score with the dense all-fields matmul + one-hot field selection."""
        k_mask, k_noise, k_drop = jax.random.split(rng, 3)
        corrupted, labels, masked_index = corruption.mfp_corrupt(
            k_mask, batch["input_ids"], mask_num, args.sampling_method,
            input_size=int(config.input_size))
        num_fields = int(config.num_fields)
        all_fields = jnp.arange(num_fields, dtype=jnp.int32)
        noise_f, noise_logq_f = per_field_alias_draw_logq(
            k_noise, fused_tab, pf_lo, pf_sizes, all_fields, k)  # (F, k)
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = dict(method=model.mfp_per_field_shared_logits, train=train)
        if train:
            kwargs["rngs"] = {"dropout": k_drop}
        if state.batch_stats and train:
            logits, mutated = model.apply(variables, corrupted, masked_index,
                                          labels, noise_f,
                                          mutable=["batch_stats"], **kwargs)
            new_bs = mutated["batch_stats"]
        else:
            logits = model.apply(variables, corrupted, masked_index, labels,
                                 noise_f, **kwargs)
            new_bs = state.batch_stats
        # logq: target from the per-field logq vector; noise via the same
        # one-hot field selection the scoring used (no per-row gathers)
        target_logq = jnp.take(logprob_noise, labels)          # (B, M)
        onehot = jax.nn.one_hot(masked_index, num_fields,
                                dtype=noise_logq_f.dtype)      # (B, M, F)
        noise_logq = jnp.einsum("fk,bmf->bmk", noise_logq_f, onehot)
        cand_logq = jnp.concatenate([target_logq[..., None], noise_logq],
                                    axis=-1)
        candidates = jnp.concatenate(
            [labels[..., None],
             jnp.zeros((labels.shape[0], mask_num, k), jnp.int32)], axis=-1)
        loss = _loss_from_logits(logits, candidates, cand_logq,
                                 batch["weight"], fields=masked_index)
        acc_count = mfp_accuracy_count(logits, batch["weight"])
        return loss, acc_count, new_bs

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        k_corrupt, k_drop = jax.random.split(rng)
        if shared_noise:
            def loss_fn(params):
                loss, acc_count, new_bs = _shared_forward(
                    state, params, batch, rng, True)
                return loss, (acc_count, new_bs)

            (loss, (acc_count, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = _update(tx, state, grads, new_bs)
            count = batch["weight"].sum() * mask_num
            return new_state, {"loss": loss, "count": count,
                               "acc_count": acc_count}
        if loss_type == "full":
            k_mask, _ = jax.random.split(k_corrupt)
            corrupted, labels, masked_index = corruption.mfp_corrupt(
                k_mask, batch["input_ids"], mask_num, args.sampling_method,
                input_size=int(config.input_size))

            def loss_fn(params):
                loss, acc_count, new_bs = _full_forward(
                    state, params, corrupted, masked_index, labels,
                    batch["weight"], k_drop, True)
                return loss, (acc_count, new_bs)

            (loss, (acc_count, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = _update(tx, state, grads, new_bs)
            count = batch["weight"].sum() * mask_num
            return new_state, {"loss": loss, "count": count,
                               "acc_count": acc_count}

        corrupted, masked_index, candidates, cand_logq = _corrupt_and_sample(
            k_corrupt, batch)

        def loss_fn(params):
            cand_logits, new_bs = _apply_train(
                model, state, params, corrupted, k_drop,
                masked_index=masked_index, candidates=candidates)
            loss = _loss_from_logits(cand_logits, candidates, cand_logq,
                                     batch["weight"], fields=masked_index)
            return loss, (cand_logits, new_bs)

        (loss, (cand_logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _update(tx, state, grads, new_bs)
        acc_count = mfp_accuracy_count(cand_logits, batch["weight"])
        count = batch["weight"].sum() * mask_num
        return new_state, {"loss": loss, "count": count, "acc_count": acc_count}

    def eval_step(state: TrainState, batch, rng):
        if shared_noise:
            loss, acc_count, _ = _shared_forward(state, state.params, batch,
                                                 rng, False)
            count = batch["weight"].sum() * mask_num
            return {"loss": loss, "count": count, "acc_count": acc_count}
        if loss_type == "full":
            corrupted, labels, masked_index = corruption.mfp_corrupt(
                rng, batch["input_ids"], mask_num, args.sampling_method,
                input_size=int(config.input_size))
            loss, acc_count, _ = _full_forward(
                state, state.params, corrupted, masked_index, labels,
                batch["weight"], rng, False)
            count = batch["weight"].sum() * mask_num
            return {"loss": loss, "count": count, "acc_count": acc_count}
        corrupted, masked_index, candidates, cand_logq = _corrupt_and_sample(
            rng, batch)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        cand_logits = _apply_eval(model, variables, corrupted,
                                  masked_index=masked_index, candidates=candidates)
        loss = _loss_from_logits(cand_logits, candidates, cand_logq,
                                 batch["weight"], fields=masked_index)
        acc_count = mfp_accuracy_count(cand_logits, batch["weight"])
        count = batch["weight"].sum() * mask_num
        return {"loss": loss, "count": count, "acc_count": acc_count}

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


# ---------------------------------------------------------------------------
# RFD: replaced feature detection, reference trainer.py:393-515
# ---------------------------------------------------------------------------

def make_rfd_steps(model, config, args, tx, base_rng):
    mask_num = corruption.mask_num_of(config.num_fields, args.mask_ratio)
    f = int(config.num_fields)
    idx_low = None if config.idx_low is None else jnp.asarray(config.idx_low)
    idx_high = None if config.idx_high is None else jnp.asarray(config.idx_high)

    def _corrupt(rng, batch):
        return corruption.rfd_corrupt(
            rng, batch["input_ids"], mask_num, args.sampling_method,
            args.RFD_replace, int(config.input_size),
            idx_low=idx_low, idx_high=idx_high,
            noise_rows=batch.get("noise_rows"))

    def _metrics(logits, labels, weight):
        per = bce_with_logits(logits, labels)
        denom = jnp.maximum(weight.sum(), 1.0) * f
        loss = (per * weight[:, None]).sum() / denom
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        acc = ((pred == labels).astype(jnp.float32) * weight[:, None]).sum() / denom
        pos_ratio = (labels * weight[:, None]).sum() / denom
        return loss, acc, pos_ratio, denom

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        k_corrupt, k_drop = jax.random.split(rng)
        corrupted, labels = _corrupt(k_corrupt, batch)

        def loss_fn(params):
            logits, new_bs = _apply_train(model, state, params, corrupted, k_drop)
            loss, acc, pos_ratio, count = _metrics(logits, labels, batch["weight"])
            return loss, (acc, pos_ratio, count, new_bs)

        (loss, (acc, pos_ratio, count, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _update(tx, state, grads, new_bs)
        return new_state, {"loss": loss, "count": count, "acc": acc,
                           "pos_ratio": pos_ratio}

    def eval_step(state: TrainState, batch, rng):
        corrupted, labels = _corrupt(rng, batch)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = _apply_eval(model, variables, corrupted)
        loss, acc, pos_ratio, count = _metrics(logits, labels, batch["weight"])
        return {"loss": loss, "count": count, "acc": acc, "pos_ratio": pos_ratio}

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)
