"""Field-blocked hybrid embedding access (map_tpu.ops.hybrid_gather) vs the
plain flat gather: forward and gradient equality, reserved-id handling, and
end-to-end model equality with/without field_bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.ops.hybrid_gather import SMALL_FIELD_MAX, hybrid_rows_gather
from map_tpu.ops.packed_table import (
    pack_factor,
    pack_table,
    packed_lookup,
    packed_shape,
)

PACK = 8
E = 16
NRESV = 10


def _geometry(rng, b=64):
    """Mixed small/big field-blocked geometry with reserved ids sprinkled."""
    sizes = [7, 24, 300, 5000, SMALL_FIELD_MAX, 40_000, 120_000]
    lo, bounds = NRESV, []
    for s in sizes:
        bounds.append((lo, lo + s))
        lo += s
    v = lo + 3  # ragged tail
    ids = np.stack([rng.integers(a, h, b) for a, h in bounds], axis=1)
    # sprinkle reserved ids (pad=0, mask=3) into every column
    mask = rng.random((b, len(sizes))) < 0.1
    ids[mask] = rng.integers(0, NRESV, mask.sum())
    return v, tuple(bounds), ids.astype(np.int32)


def test_forward_matches_flat():
    rng = np.random.default_rng(0)
    v, bounds, ids = _geometry(rng)
    r, w = packed_shape(v, E)
    table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
    packed = pack_table(table, E)
    got = hybrid_rows_gather(packed, jnp.asarray(ids), bounds, PACK, NRESV)
    want = jnp.take(packed, jnp.asarray(ids) // PACK, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("mode", ["fwd", "both", "matmul"])
def test_grad_matches_flat(mode):
    rng = np.random.default_rng(1)
    v, bounds, ids = _geometry(rng)
    table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
    packed = pack_table(table, E)
    ids_d = jnp.asarray(ids)
    cot = jnp.asarray(rng.normal(size=(*ids.shape, packed.shape[1])),
                      jnp.float32)

    def f_hybrid(p):
        return jnp.sum(
            hybrid_rows_gather(p, ids_d, bounds, PACK, NRESV, mode) * cot)

    def f_flat(p):
        return jnp.sum(jnp.take(p, ids_d // PACK, axis=0) * cot)

    gh = jax.grad(f_hybrid)(packed)
    gf = jax.grad(f_flat)(packed)
    # boundary-row folds change the f32 summation order vs the flat scatter
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gf),
                               rtol=1e-5, atol=1e-5)


def test_packed_lookup_routes_hybrid():
    rng = np.random.default_rng(2)
    v, bounds, ids = _geometry(rng)
    table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
    packed = pack_table(table, E)
    ids_d = jnp.asarray(ids)
    got = packed_lookup(packed, ids_d, E, field_bounds=bounds)
    want = packed_lookup(packed, ids_d, E)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # values equal the logical table rows
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.take(table, ids_d, axis=0)))


def test_packed_lookup_hybrid_grads():
    rng = np.random.default_rng(3)
    v, bounds, ids = _geometry(rng)
    table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
    packed = pack_table(table, E)
    ids_d = jnp.asarray(ids)
    cot = jnp.asarray(rng.normal(size=(*ids.shape, E)), jnp.float32)

    gh = jax.grad(lambda p: jnp.sum(
        packed_lookup(p, ids_d, E, field_bounds=bounds) * cot))(packed)
    gf = jax.grad(lambda p: jnp.sum(
        packed_lookup(p, ids_d, E) * cot))(packed)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gf),
                               rtol=1e-6, atol=1e-6)


def test_all_small_and_all_big():
    rng = np.random.default_rng(4)
    for sizes in ([7, 30, 500], [30_000, 70_000]):
        lo, bounds = NRESV, []
        for s in sizes:
            bounds.append((lo, lo + s))
            lo += s
        v = lo
        ids = np.stack([rng.integers(a, h, 32) for a, h in bounds],
                       axis=1).astype(np.int32)
        table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
        packed = pack_table(table, E)
        got = hybrid_rows_gather(packed, jnp.asarray(ids), tuple(bounds),
                                 PACK, NRESV)
        want = jnp.take(packed, jnp.asarray(ids) // PACK, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_equality_with_field_bounds():
    """DCNv2 forward + grads identical with and without the hybrid path."""
    from conftest import base_model_config as make_config

    from map_tpu import models
    from map_tpu.objectives.supervised import bce_loss

    rng = np.random.default_rng(5)
    sizes = [50, 2000, 9000, 30_000]
    lo, bounds = NRESV, []
    for s in sizes:
        bounds.append([lo, lo + s])
        lo += s
    v = lo
    ids = np.stack([rng.integers(a, h, 16) for a, h in bounds],
                   axis=1).astype(np.int32)
    labels = rng.integers(0, 2, 16).astype(np.float32)
    weight = np.ones(16, np.float32)

    outs = []
    for blocked in (True, False):
        cfg = make_config(model_name="dcnv2", input_size=v, num_fields=4,
                          embed_size=E, packed_tables=True,
                          field_blocked_lookup=blocked,
                          idx_low=[a for a, _ in bounds],
                          idx_high=[h for _, h in bounds])
        model = models.from_config(cfg)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               jnp.asarray(ids), train=False)

        def loss_fn(params):
            logits = model.apply({"params": params}, jnp.asarray(ids),
                                 train=False)
            return bce_loss(logits, jnp.asarray(labels), jnp.asarray(weight))

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        outs.append((loss, grads))

    (l1, g1), (l2, g2) = outs
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_field_groups_split():
    from map_tpu.ops.hybrid_gather import field_groups

    bounds = ((10, 20), (20, 20 + SMALL_FIELD_MAX),
              (20 + SMALL_FIELD_MAX, 20 + SMALL_FIELD_MAX + 100_000))
    small, big = field_groups(bounds, PACK)
    assert [f for f, *_ in small] == [0, 1]
    assert list(big) == [2]


def test_tpu_kernel_path_grads(monkeypatch):
    """The TPU integration (Pallas field_block_scatter backward) in interpret
    mode: grads must match the flat scatter."""
    import functools

    import map_tpu.ops.hybrid_gather as hg
    import map_tpu.ops.pallas_field_gather as pfg

    monkeypatch.setattr(hg, "_on_tpu", lambda: True)
    monkeypatch.setenv("MAP_TPU_HYBRID_MODE", "bwd_pallas")
    monkeypatch.setattr(
        pfg, "field_block_scatter",
        functools.partial(pfg.field_block_scatter, interpret=True))

    rng = np.random.default_rng(7)
    v, bounds, ids = _geometry(rng, b=48)
    table = jnp.asarray(rng.normal(size=(v, E)), jnp.float32)
    packed = pack_table(table, E)
    ids_d = jnp.asarray(ids)
    cot = jnp.asarray(rng.normal(size=(*ids.shape, packed.shape[1])),
                      jnp.float32)
    gh = jax.grad(lambda p: jnp.sum(
        hybrid_rows_gather(p, ids_d, bounds, PACK, NRESV) * cot))(packed)
    gf = jax.grad(lambda p: jnp.sum(
        jnp.take(p, ids_d // PACK, axis=0) * cot))(packed)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gf),
                               rtol=1e-5, atol=1e-5)
