"""Duplicate-folding scatter pipeline (ops/dedup_scatter.py): gradient
equality with the plain gather/segment-sum oracle across capacity tiers,
including the fallback when the batch has more distinct ids than any tier.

Reference counterpart: torch scatter-add under nn.Embedding backward
(`code/nce/index_linear.py:99-106`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.ops import dedup_scatter as ds


def _oracle_scatter(ids, g, v):
    return jax.ops.segment_sum(g.reshape(-1, g.shape[-1]),
                               ids.reshape(-1), num_segments=v)


@pytest.mark.parametrize("num_distinct,capacities", [
    (7, (16, 64)),      # fits smallest tier
    (40, (16, 64)),     # second tier
    (300, (16, 64)),    # fallback: more unique than max capacity
])
def test_dedup_scatter_add_matches_segment_sum(num_distinct, capacities):
    rng = np.random.default_rng(num_distinct)
    v, n, e = 500, 2048, 8
    pool = rng.choice(v, num_distinct, replace=False)
    ids = jnp.asarray(rng.choice(pool, size=n), jnp.int32)
    g = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
    out = ds.dedup_scatter_add(ids, g, v, capacities)
    ref = _oracle_scatter(ids, g, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("num_distinct", [5, 60, 3000])
def test_decoder_gather_grads_match_oracle(num_distinct, monkeypatch):
    # force small tiers so each case exercises a different branch
    monkeypatch.setattr(ds, "DECODER_TIERS", (16, 128))
    rng = np.random.default_rng(num_distinct)
    v, e = 4000, 8
    b, m, k1 = 16, 3, 26
    pool = rng.choice(v, num_distinct, replace=False)
    ids = jnp.asarray(rng.choice(pool, size=(b, m, k1)), jnp.int32)
    emb = jnp.asarray(rng.standard_normal((v, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(v), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, m, e)), jnp.float32)

    def loss_dedup(emb, bias):
        rows, bb = ds.decoder_gather(emb, bias, ids)
        logits = jnp.einsum("bmke,bme->bmk", rows, x) + bb
        return jnp.sum(jnp.tanh(logits))

    def loss_oracle(emb, bias):
        rows = jnp.take(emb, ids, axis=0)
        bb = jnp.take(bias, ids)
        logits = jnp.einsum("bmke,bme->bmk", rows, x) + bb
        return jnp.sum(jnp.tanh(logits))

    out_d = jax.jit(loss_dedup)(emb, bias)
    out_o = jax.jit(loss_oracle)(emb, bias)
    np.testing.assert_allclose(float(out_d), float(out_o), rtol=1e-5)

    gd = jax.jit(jax.grad(loss_dedup, argnums=(0, 1)))(emb, bias)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1)))(emb, bias)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(go[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(go[1]),
                               rtol=3e-4, atol=3e-4)


def test_decoder_gather_pallas_scatter_mode():
    """nce_grad='dedup_pallas' wiring (static use_pallas_scatter arg):
    off-TPU the kernel falls back to segment_sum, so gradients must still
    match the oracle exactly."""
    rng = np.random.default_rng(0)
    v, e = 2000, 8
    ids = jnp.asarray(rng.integers(0, v, (8, 3, 6)), jnp.int32)
    emb = jnp.asarray(rng.standard_normal((v, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(v), jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 3, e)), jnp.float32)

    def loss(emb, bias, gather):
        rows, bb = gather(emb, bias, ids)
        return jnp.sum(jnp.tanh(jnp.einsum("bmke,bme->bmk", rows, x) + bb))

    gd = jax.grad(lambda e_, b_: loss(
        e_, b_, lambda em, bi, i: ds.decoder_gather(em, bi, i, True)),
        argnums=(0, 1))(emb, bias)
    go = jax.grad(lambda e_, b_: loss(
        e_, b_, lambda em, bi, i: (jnp.take(em, i, axis=0), jnp.take(bi, i))),
        argnums=(0, 1))(emb, bias)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(go[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(go[1]),
                               rtol=3e-4, atol=3e-4)


def test_decoder_score_target_matches_score_fused():
    """dedup_bwd (plain forward, backward-only dedup) must match the
    score-fused path bitwise-to-ulp: same folds, same scatter, only op
    scheduling moves."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from map_tpu.ops import dedup_scatter as ds
    from map_tpu.ops.packed_table import pack_table

    rng = np.random.default_rng(4)
    v, e, b, m = 5000, 32, 64, 7
    emb = jnp.asarray(pack_table(
        jnp.asarray(rng.standard_normal((v, e)), jnp.float32), e))
    bias = jnp.asarray(pack_table(
        jnp.asarray(rng.standard_normal((v, 1)), jnp.float32), 1))
    inputs = jnp.asarray(rng.standard_normal((b, m, e)), jnp.float32)
    ids = jnp.asarray(
        np.minimum((rng.pareto(1.1, (b, m)) * 100).astype(np.int64), v - 1)
        .astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((b, m)), jnp.float32)

    def loss_fused(emb_, bias_, inp_):
        s = ds.decoder_score_packed(emb_, bias_, inp_, ids[..., None],
                                    e, v)[..., 0]
        return jnp.sum(s * cot)

    def loss_bwd(emb_, bias_, inp_):
        return jnp.sum(ds.decoder_score_target(emb_, bias_, inp_, ids,
                                               e, v) * cot)

    fa = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))
    fb = jax.jit(jax.value_and_grad(loss_bwd, argnums=(0, 1, 2)))
    va, ga = fa(emb, bias, inputs)
    vb, gb = fb(emb, bias, inputs)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for x, y, name in zip(ga, gb, ("emb", "bias", "inputs")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6, err_msg=name)
