"""Sparse-stream fused AdamW (ops/sparse_adamw): the encoded compact streams
(target + noise regions) consumed in the table pass must reproduce the
dense-gradient AdamW update — gradient delivery bit-exact (one-hot matmul
scatter with the exact 3-way bf16 split), full algebra to ulp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.ops import sparse_adamw
from map_tpu.ops.fused_adamw import _adamw_math, pack_scalars
from map_tpu.ops.packed_table import expand_to_packed


def _mk_stream(rng, rows, pack, n, vocab):
    """Sorted unique logical ids (Zipf-ish head concentration) + f32 vals,
    sentinel-padded to n."""
    raw = np.minimum(
        (rng.pareto(1.1, size=4 * n) * 50).astype(np.int64), vocab - 1)
    uniq = np.unique(raw)
    rng.shuffle(uniq)
    uniq = np.sort(uniq[: min(len(uniq), n - 4)])
    c = len(uniq)
    ids = np.concatenate([uniq, np.full(n - c, vocab, np.int64)])
    phys = np.where(np.arange(n) < c, ids // pack, rows)
    sub = np.where(np.arange(n) < c, ids % pack, 0)
    vals = rng.standard_normal((n, 128 // pack)).astype(np.float32)
    vals[c:] = 0.0
    return (jnp.asarray(ids, jnp.int32), jnp.asarray(phys, jnp.int32),
            jnp.asarray(sub, jnp.int32), jnp.asarray(vals), c)


@pytest.mark.parametrize("pack", [4, 8])
def test_kernel_matches_dense_math(pack):
    rows, vocab = 16384, 16384 * pack - 7
    nt, nn = 2048, 2 * 128 * pack  # target + minimum-size noise stream
    rng = np.random.default_rng(0)
    t_ids, t_phys, t_sub, t_vals, _ = _mk_stream(rng, rows, pack, nt, vocab)
    n_ids, n_phys, n_sub, n_vals, _ = _mk_stream(rng, rows, pack, nn, vocab)
    p, mu, nu = (jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
                 for _ in range(3))
    nu = jnp.abs(nu)
    scalars = pack_scalars(1e-3, 0.05, 0.9, 0.999, 1e-8, 3.0)
    # b1 = 0 makes new_mu == g exactly: pins that the in-kernel matmul
    # scatter delivers the gradient BIT-EXACTLY for unique ids
    scalars_gprobe = pack_scalars(1e-3, 0.05, 0.0, 0.999, 1e-8, 3.0)

    sparse_adamw.enable(True)
    try:
        plan = sparse_adamw.pf_plan(rows, 128, pack, nt, nn)
        assert plan is not None
        enc = (sparse_adamw.encode_target(t_vals, t_sub, t_phys, plan)
               + sparse_adamw.encode_noise(n_vals, n_sub, n_phys, plan))
        assert sparse_adamw.lookup((rows, 128)) == plan
        got = sparse_adamw.sparse_fused_adamw(
            p, mu, nu, enc, scalars, plan.c_enc, plan.n_enc, plan.wblk,
            interpret=True)
        gprobe = sparse_adamw.sparse_fused_adamw(
            p, mu, nu, enc, scalars_gprobe, plan.c_enc, plan.n_enc,
            plan.wblk, interpret=True)
    finally:
        sparse_adamw.enable(False)

    # dense reference: scatter the same streams, run the same AdamW algebra
    g = jnp.zeros((rows, 128), jnp.float32)
    for ids, vals in ((t_ids, t_vals), (n_ids, n_vals)):
        wide = expand_to_packed(vals, ids % pack, pack)
        g = g.at[ids // pack].add(wide, mode="drop",
                                  indices_are_sorted=True)

    # target/noise id collisions sum in different order -> ulp; everything
    # else must be bitwise. Collisions are rare in this stream; assert the
    # bit-exact share dominates.
    gk = np.asarray(gprobe[1])
    gd = np.asarray(g)
    np.testing.assert_allclose(gk, gd, rtol=1e-6, atol=1e-7)
    assert (gk == gd).mean() > 0.999

    want = _adamw_math(p, mu, nu, g, *[scalars[0, i] for i in range(7)])
    for a, b, name in zip(got, want, ("p", "mu", "nu")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-6, err_msg=name)


def test_registry_collision_raises():
    sparse_adamw.enable(True)
    try:
        plan = sparse_adamw.pf_plan(16384, 128, 4, 2048, 1024)
        sparse_adamw.register((16384, 128), plan)
        sparse_adamw.register((16384, 128), plan)  # identical: fine
        other = sparse_adamw.pf_plan(16384, 128, 4, 4096, 1024)
        with pytest.raises(ValueError):
            sparse_adamw.register((16384, 128), other)
    finally:
        sparse_adamw.enable(False)
    assert sparse_adamw.lookup((16384, 128)) is None  # disabled wipes


def test_pf_plan_contract():
    sparse_adamw.enable(True)
    try:
        assert sparse_adamw.pf_plan(253952, 128, 4, 28672, 600) is not None
        # per-position stream: capacity fallback cond exists -> None
        assert sparse_adamw.pf_plan(253952, 128, 4, 745472, 600) is None
        # doesn't fit: 2C + 2N > R
        assert sparse_adamw.pf_plan(4096, 128, 4, 2048, 600) is None
        # rows not a multiple of wblk
        assert sparse_adamw.pf_plan(253952 + 128, 128, 4, 28672, 600) is None
    finally:
        sparse_adamw.enable(False)
    assert sparse_adamw.pf_plan(253952, 128, 4, 28672, 600) is None  # off
