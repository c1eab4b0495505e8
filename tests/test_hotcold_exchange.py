"""Hot-prefix-replicated / cold-compact sharded exchange (VERDICT round-3
next #4): the work-reducing alternative to the psum baseline must be
bit-equivalent to a plain gather — forward and gradient — on the 8-device
virtual mesh, including under forced capacity overflow (the lax.cond
fallback), and e2e under the trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from map_tpu.parallel.embedding import (
    hotcold_embedding_lookup,
    sharded_embedding_lookup,
)
from map_tpu.parallel.mesh import build_mesh


def _mk(v=4096, w=16, n=512, hot_frac=0.5, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((v, w)), jnp.float32)
    # Zipf-ish ids: half the stream from a hot prefix region, rest uniform
    hot_rows = np.unique(rng.integers(0, v // 8, 64)).astype(np.int32)
    n_hot = int(n * hot_frac)
    ids = np.concatenate([
        rng.choice(hot_rows, n_hot),
        rng.integers(0, v, n - n_hot),
    ]).astype(np.int32)
    rng.shuffle(ids)
    return table, jnp.asarray(ids.reshape(-1, 8)), np.sort(hot_rows)


@pytest.mark.parametrize("cap_frac", [1.5, 0.02])  # 0.02 forces overflow
def test_hotcold_matches_plain_gather(cap_frac):
    mesh = build_mesh(2, 4)
    table, ids, hot = _mk()

    want = jnp.take(table, ids, axis=0)

    @jax.jit
    def run(tab, i):
        return hotcold_embedding_lookup(tab, i, mesh, hot,
                                        capacity_frac=cap_frac)

    got = run(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=0)


@pytest.mark.parametrize("cap_frac", [1.5, 0.02])
def test_hotcold_gradient_matches(cap_frac):
    mesh = build_mesh(2, 4)
    table, ids, hot = _mk(seed=1)
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal(ids.shape + (16,)),
        jnp.float32)

    def loss_plain(tab):
        return jnp.sum(jnp.take(tab, ids, axis=0) * cot)

    def loss_hc(tab):
        return jnp.sum(hotcold_embedding_lookup(
            tab, ids, mesh, hot, capacity_frac=cap_frac) * cot)

    g_plain = jax.jit(jax.grad(loss_plain))(table)
    g_hc = jax.jit(jax.grad(loss_hc))(table)
    np.testing.assert_allclose(np.asarray(g_hc), np.asarray(g_plain),
                               rtol=0, atol=1e-5)


def test_hotcold_matches_psum_exchange():
    mesh = build_mesh(4, 2)
    table, ids, hot = _mk(v=1024, seed=3)

    a = jax.jit(lambda t, i: sharded_embedding_lookup(t, i, mesh))(table, ids)
    b = jax.jit(lambda t, i: hotcold_embedding_lookup(t, i, mesh, hot))(
        table, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.parametrize("dp,mp", [(2, 4), (1, 8)])
def test_hotcold_work_reduction_is_real(dp, mp):
    """Pin the WORK, not just the values (VERDICT round-4 weak #3): on a
    Zipf-ish stream whose head is in the hot list, the compact path must
    actually serve the cold ids — zero overflow, every cold id inside
    exactly one shard's owned segment, and per-shard capacity C a genuine
    ~N/S reduction — so a capacity/segment regression that silently degrades
    to the full-gather fallback fails loudly, not just bit-equally."""
    mesh = build_mesh(dp, mp)
    table, ids, hot = _mk(v=4096, n=1024, seed=5)

    @jax.jit
    def run(tab, i):
        return hotcold_embedding_lookup(tab, i, mesh, hot, capacity_frac=1.5,
                                        with_stats=True)

    out, stats = run(table, ids)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(table, ids, axis=0)))
    ovf = np.asarray(stats["total_overflow"])          # (S_data,)
    counts = np.asarray(stats["seg_counts"])           # (S_data, S_model)
    ncold = np.asarray(stats["num_cold"])              # (S_data,)
    cap = stats["capacity"]
    n_per = stats["n_per_data_shard"]
    # 1. the compact path is the one that ran (no capacity overflow)
    assert (ovf == 0).all(), ovf
    # 2. owned segments partition the cold stream exactly: 100% of cold ids
    #    served by the compact path (>= (1 - eps) with eps = 0)
    np.testing.assert_array_equal(counts.sum(axis=1), ncold)
    # 3. every segment fits its capacity window
    assert (counts.max(axis=1) <= cap).all(), (counts, cap)
    # 4. C is a real per-shard work reduction: ~ N*frac/S (+8 alignment),
    #    and far below the psum baseline's N-per-shard gather
    assert cap <= int(n_per * 1.5) // mp + 8, (cap, n_per)
    assert cap <= n_per // 2, (cap, n_per)


def test_hotcold_forced_overflow_reports(monkeypatch):
    """The stats channel must also SEE overflow when capacity is starved —
    guarding the guard: if total_overflow stopped firing, test
    work-reduction above could pass vacuously on a broken compact path."""
    mesh = build_mesh(2, 4)
    table, ids, hot = _mk(v=4096, n=1024, seed=6)
    out, stats = jax.jit(lambda t, i: hotcold_embedding_lookup(
        t, i, mesh, hot, capacity_frac=0.02, with_stats=True))(table, ids)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(table, ids, axis=0)))
    assert (np.asarray(stats["total_overflow"]) > 0).any()


def test_hotcold_e2e_matches_psum(tmp_path, synth_dir):
    """Full trainer run: rows-sharded DCNv2 scratch with table_exchange=
    hotcold must reproduce the psum run's metrics (same batches, same rng)."""
    import re

    from map_tpu.run import main

    def run(tag, extra):
        out = tmp_path / tag
        args = [
            "--model_name", "dcnv2", "--output_dir", str(out),
            "--dataset_name", "synth", "--data_dir", synth_dir,
            "--per_device_train_batch_size", "256",
            "--per_device_eval_batch_size", "512",
            "--embed_size", "8", "--hidden_size", "32",
            "--num_hidden_layers", "1", "--num_cross_layers", "2",
            "--logging_steps", "50", "--hidden_dropout_rate", "0.0",
            "--learning_rate", "1e-2", "--num_train_epochs", "1",
            "--lr_sched", "const", "--weight_decay", "0.1",
            "--num_model_shards", "2", "--table_sharding", "rows",
        ] + extra
        assert main(args) == 0
        log = open(out / "train.log").read()
        if "hotcold" in tag:  # the run must actually route through hotcold
            assert "hot-prefix cache" in log, log[-2000:]
        return [float(x) for x in re.findall(r"'eval_auc': ([\d.]+)", log)]

    psum = run("psum", [])
    hc = run("hotcold", ["--table_exchange", "hotcold",
                         "--hot_rows_per_field", "8"])
    assert len(psum) == len(hc) >= 1
    for a, b in zip(psum, hc):
        assert abs(a - b) < 2e-5, (psum, hc)
