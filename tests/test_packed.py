"""Lane-packed table storage (map_tpu.ops.packed_table): exact equivalence.

The packed layout is pure storage engineering — every logical element must see
bit-identical math vs the flat (V, E) layout: lookup values, gradients
(scatter-add transpose), and the AdamW trajectory of real rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.ops.packed_table import (
    pack_factor,
    pack_table,
    packed_lookup,
    packed_rows,
    packed_shape,
    unpack_table,
)


def test_pack_factor():
    assert pack_factor(16) == 8
    assert pack_factor(32) == 4
    assert pack_factor(64) == 2
    assert pack_factor(128) == 1
    assert pack_factor(256) == 1
    assert pack_factor(48) == 1  # 128 % 48 != 0 -> no packing


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for v, e in ((1000, 16), (1003, 16), (77, 32), (129, 128)):
        t = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
        packed = pack_table(t, e)
        assert packed.shape == packed_shape(v, e)
        assert packed.shape[0] == packed_rows(v, e)
        np.testing.assert_array_equal(unpack_table(packed, v, e), t)


def test_packed_lookup_matches_take():
    rng = np.random.default_rng(1)
    v, e = 1003, 16
    t = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (7, 24)), jnp.int32)
    packed = pack_table(t, e)
    out = packed_lookup(packed, ids, e)
    np.testing.assert_array_equal(out, jnp.take(t, ids, axis=0))


def test_packed_lookup_grad_matches_scatter_add():
    """d/dtable of a packed lookup == the flat scatter-add, relocated."""
    rng = np.random.default_rng(2)
    v, e = 257, 32
    t = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (11, 5)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(11, 5, e)), jnp.float32)

    g_flat = jax.grad(lambda tt: jnp.vdot(jnp.take(tt, ids, axis=0), cot))(t)
    packed = pack_table(t, e)
    g_packed = jax.grad(
        lambda pp: jnp.vdot(packed_lookup(pp, ids, e), cot))(packed)
    np.testing.assert_allclose(unpack_table(g_packed, v, e), g_flat,
                               rtol=0, atol=1e-5)
    # padding rows get exactly zero gradient
    tail = g_packed.reshape(-1, e)[v:]
    np.testing.assert_array_equal(tail, jnp.zeros_like(tail))


@pytest.mark.parametrize("model_name", ["dcnv2"])
def test_packed_embeddings_model_equivalence(model_name):
    """Full-model forward + grads: packed_tables=True == False exactly."""
    from map_tpu import models
    from map_tpu.config import Config

    rng = np.random.default_rng(3)
    base = dict(
        model_name=model_name, input_size=400, num_fields=6, embed_size=16,
        hidden_size=32, num_hidden_layers=2, hidden_act="relu",
        hidden_dropout_rate=0.0, num_cross_layers=2, pretrain=False,
        embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
        use_pallas=False)
    ids = jnp.asarray(rng.integers(10, 400, (8, 6)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, 8), jnp.float32)

    outs, grads = [], []
    for packed in (False, True):
        cfg = Config(**base, packed_tables=packed)
        model = models.from_config(cfg)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, ids)
        params = variables["params"]

        def loss_fn(p):
            logits = model.apply({"params": p}, ids).reshape(-1)
            return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        outs.append(float(loss))
        table = g["embed"]["embedding"]
        if packed:
            from map_tpu.ops.packed_table import unpack_table as up

            table = up(table, 400, 16)
        grads.append(np.asarray(table))
    assert outs[0] == pytest.approx(outs[1], abs=0)
    np.testing.assert_allclose(grads[0], grads[1], rtol=0, atol=1e-6)


def test_decoder_gather_packed_matches_flat():
    """decoder_gather_packed == decoder_gather: values and both gradients."""
    from map_tpu.ops import dedup_scatter as ds

    rng = np.random.default_rng(4)
    v, e = 512, 32  # pack 4; divisible
    emb = jnp.asarray(rng.normal(size=(v, e)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)), jnp.float32)
    # heavy duplication like Zipf noise
    ids = jnp.asarray(rng.integers(0, 40, (6, 3, 9)), jnp.int32)
    cot_r = jnp.asarray(rng.normal(size=(*ids.shape, e)), jnp.float32)
    cot_b = jnp.asarray(rng.normal(size=ids.shape), jnp.float32)

    emb_p = pack_table(emb, e)
    bias_p = pack_table(bias[:, None], 1)

    def flat_loss(t, b):
        rows, bb = ds.decoder_gather(t, b, ids)
        return jnp.vdot(rows, cot_r) + jnp.vdot(bb, cot_b)

    def packed_loss(t, b):
        rows, bb = ds.decoder_gather_packed(t, b, ids, e, v)
        return jnp.vdot(rows, cot_r) + jnp.vdot(bb, cot_b)

    (lf, (ge, gb)) = jax.value_and_grad(flat_loss, argnums=(0, 1))(emb, bias)
    (lp, (gpe, gpb)) = jax.value_and_grad(packed_loss, argnums=(0, 1))(
        emb_p, bias_p)
    assert lf == pytest.approx(float(lp), rel=1e-6)
    np.testing.assert_allclose(unpack_table(gpe, v, e), ge, rtol=0, atol=1e-4)
    np.testing.assert_allclose(unpack_table(gpb, v, 1)[:, 0], gb,
                               rtol=0, atol=1e-4)


def test_packed_mfp_step_matches_flat():
    """Full jitted MFP train step: packed_tables True == False (same seeds)."""
    import jax.numpy as jnp

    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.objectives.alias import (
        build_alias_table, noise_distribution)
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    rng = np.random.default_rng(5)
    v, f = 512, 8
    feat_count = rng.integers(1, 100, v).astype(np.float32)
    probs = noise_distribution(feat_count)
    prob_t, alias_t = build_alias_table(np.asarray(probs))
    batch_ids = np.asarray(rng.integers(10, v, (16, 8)), np.int32)

    losses = []
    for packed in (False, True):
        cfg = Config(
            model_name="dnn", input_size=v, num_fields=f, embed_size=16,
            hidden_size=32, num_hidden_layers=2, hidden_act="relu",
            hidden_dropout_rate=0.0, pretrain=True, pt_type="MFP",
            proj_size=32, pt_neg_num=5, nce_loss_type="nce",
            embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
            use_pallas=False, packed_tables=packed,
            norm_term=float(np.log(v)), logprob_noise=np.log(probs))
        args = TrainingArguments(
            output_dir="/tmp/t", learning_rate=1e-2, weight_decay=0.01,
            lr_sched="const", warmup_ratio=0.0, max_grad_norm=0.0,
            mask_ratio=0.3, sampling_method="randint",
            per_device_train_batch_size=16)
        model = models.from_config(cfg)
        tx, _ = build_optimizer(args, 100, 0)
        batch = {
            "input_ids": batch_ids,
            "labels": np.zeros(16, np.float32),
            "weight": np.ones(16, np.float32),
        }
        state = ts.create_train_state(model, cfg, args, tx,
                                      jax.random.PRNGKey(0), batch)
        step, _ = ts.make_mfp_steps(model, cfg, args, tx,
                                    jax.random.PRNGKey(1),
                                    prob_t, alias_t, np.log(probs))
        ls = []
        b = {k: jnp.asarray(x) for k, x in batch.items()}
        for _ in range(3):
            state, m = step(state, b)
            ls.append(float(m["loss"]))
        losses.append(ls)
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_packed_init_matches_flat_reshape():
    """Param init draws the same distribution: packed init == reshape of the
    flat init on the padded row count (same key, same element stream)."""
    from map_tpu.nn.init import embedding_init

    init = embedding_init(6, 16)
    key = jax.random.PRNGKey(7)
    flat = init(key, (1000, 16))
    packed = pack_table(flat, 16)
    assert packed.shape == (125, 128)
    np.testing.assert_array_equal(unpack_table(packed, 1000, 16), flat)
