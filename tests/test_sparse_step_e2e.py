"""End-to-end MFP train-step equality: sparse-stream decoder AdamW
(config.sparse_table_update via ops/sparse_adamw) vs the dense scatter path.
The gradient handoff is bit-exact; the update algebra may differ by compiler
fusion choices only, so multi-step trajectories must agree to ulp class."""

import jax
import jax.numpy as jnp
import numpy as np

from map_tpu import models
from map_tpu.config import Config, TrainingArguments
from map_tpu.objectives.alias import build_per_field_alias
from map_tpu.ops import sparse_adamw
from map_tpu.train import train_step as ts
from map_tpu.train.optimizer import build_optimizer


def _setup(b=256, f=8, per_field=True):
    # V ~ 18k -> packed decoder rows 4608 >= 2*c_enc + 2*n_enc = 4096
    sizes = [7, 24, 300, 2000, 8000, 6500, 1360, 1]
    lo, lows = 10, []
    for s in sizes:
        lows.append(lo)
        lo += s
    v = lo  # 18202
    idx_low, idx_high = lows, lows[1:] + [lo]
    rng = np.random.default_rng(0)
    counts = rng.random(v).astype(np.float64) + 0.1
    cfg = Config(
        model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
        hidden_size=64, num_hidden_layers=2, hidden_act="relu",
        hidden_dropout_rate=0.0, num_cross_layers=2, pretrain=True,
        pt_type="MFP", embed_norm=False, layer_norm_eps=1e-12,
        embed_dropout_rate=0.0, use_pallas=False, packed_tables=True,
        fused_table_update=True, proj_size=32, pt_neg_num=5,
        nce_loss_type="nce", idx_low=idx_low, idx_high=idx_high,
        feat_num_per_field=np.asarray(idx_high) - np.asarray(idx_low))
    cfg.nce_grad = "dedup"
    args = TrainingArguments(
        output_dir="/tmp/sparse_e2e", learning_rate=1e-2, weight_decay=0.05,
        lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
        mask_ratio=0.4, sampling_method="randint", pretrain=True,
        pt_type="MFP", pt_shared_noise=per_field,
        pt_per_field_noise=per_field)
    lo64 = np.asarray(idx_low, np.int64)
    hi64 = np.asarray(idx_high, np.int64)
    pf_prob, pf_alias, logq, lnz = build_per_field_alias(counts, lo64, hi64)
    cfg.logprob_noise = logq
    cfg.norm_term = lnz
    pf = (pf_prob, pf_alias, lo64.astype(np.int32),
          (hi64 - lo64).astype(np.int32), lnz)
    batch = {
        "input_ids": jnp.asarray(np.stack(
            [rng.integers(a, bb, b) for a, bb in zip(idx_low, idx_high)],
            axis=1), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, b), jnp.float32),
        "weight": jnp.ones((b,), jnp.float32),
    }
    return cfg, args, pf, batch, pf_prob, pf_alias, logq


def _run(n_steps, sparse, per_field=True):
    cfg, args, pf, batch, prob_t, alias_t, logq = _setup(per_field=per_field)
    sparse_adamw.enable(sparse)
    try:
        model = models.from_config(cfg)
        tx, _ = build_optimizer(args, 1000, 0)
        state = ts.create_train_state(model, cfg, args, tx,
                                      jax.random.PRNGKey(0), batch)
        step, _ = ts.make_mfp_steps(
            model, cfg, args, tx, jax.random.PRNGKey(1), prob_t, alias_t,
            logq, per_field=pf if per_field else None)
        losses = []
        for _ in range(n_steps):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
    finally:
        sparse_adamw.enable(False)
    emb = state.params["mfp_decoder"]["emb"]
    return losses, np.asarray(emb), np.asarray(
        state.params["embed"]["embedding"])


def test_pf_shared_step_sparse_matches_dense():
    n = 3
    dense_losses, dense_emb, dense_in = _run(n, sparse=False)
    sparse_losses, sparse_emb, sparse_in = _run(n, sparse=True)
    assert sparse_adamw.lookup(dense_emb.shape) is None  # wiped after
    np.testing.assert_allclose(sparse_losses, dense_losses, rtol=2e-6)
    np.testing.assert_allclose(sparse_emb, dense_emb, rtol=2e-4, atol=2e-7)
    # the input table never routes through the sparse path; only compiler
    # fusion contexts differ across the two programs -> ulp class
    np.testing.assert_allclose(sparse_in, dense_in, rtol=1e-5, atol=1e-6)


def test_sparse_engaged_not_vacuous():
    """The sparse run must actually register an encoding (else the test
    above compares dense with dense)."""
    cfg, args, pf, batch, prob_t, alias_t, logq = _setup()
    sparse_adamw.enable(True)
    try:
        model = models.from_config(cfg)
        tx, _ = build_optimizer(args, 1000, 0)
        state = ts.create_train_state(model, cfg, args, tx,
                                      jax.random.PRNGKey(0), batch)
        step, _ = ts.make_mfp_steps(
            model, cfg, args, tx, jax.random.PRNGKey(1), prob_t, alias_t,
            logq, per_field=pf)
        state, _ = step(state, batch)
        emb_shape = state.params["mfp_decoder"]["emb"].shape
        assert sparse_adamw.lookup(emb_shape) is not None, \
            "sparse path did not engage at this geometry"
    finally:
        sparse_adamw.enable(False)
