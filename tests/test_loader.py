"""Batcher semantics: fixed shapes, padding weights, seeded reproducibility,
noise-row side channel; multi-step scan equivalence."""

import jax
import numpy as np

from map_tpu.data.loader import Batcher


def _data(n=1000, f=6, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(10, 500, (n, f)).astype(np.int32),
            rng.integers(0, 2, n).astype(np.float32))


def test_fixed_shapes_and_padding():
    x, y = _data(n=1000)
    b = Batcher(x, y, batch_size=256, shuffle=True, seed=1)
    batches = list(b.epoch(0))
    assert len(batches) == 4  # ceil(1000/256)
    for bt in batches:
        assert bt["input_ids"].shape == (256, 6)
        assert bt["labels"].shape == (256,)
        assert bt["weight"].shape == (256,)
    # last batch: 1000 - 3*256 = 232 real examples
    assert batches[-1]["weight"].sum() == 232
    assert batches[0]["weight"].sum() == 256


def test_epoch_reproducible_and_covering():
    x, y = _data()
    b = Batcher(x, y, batch_size=128, shuffle=True, seed=7)
    e0a = [bt["input_ids"] for bt in b.epoch(0)]
    e0b = [bt["input_ids"] for bt in b.epoch(0)]
    for a, c in zip(e0a, e0b):
        np.testing.assert_array_equal(a, c)  # same seed+epoch = same stream
    e1 = [bt["input_ids"] for bt in b.epoch(1)]
    assert not all(np.array_equal(a, c) for a, c in zip(e0a, e1))
    # all labels covered exactly once (over real rows)
    got = np.concatenate([bt["labels"][bt["weight"] > 0] for bt in b.epoch(0)])
    assert len(got) == 1000


def test_no_shuffle_is_sequential():
    x, y = _data()
    b = Batcher(x, y, batch_size=100, shuffle=False)
    first = next(b.epoch(0))
    np.testing.assert_array_equal(first["input_ids"], x[:100])


def test_noise_rows_shape():
    x, y = _data()
    b = Batcher(x, y, batch_size=64, shuffle=True, seed=0,
                noise_source=x, noise_rows_per_example=3)
    bt = next(b.epoch(0))
    assert bt["noise_rows"].shape == (64 * 3, 6)
    # noise rows come from the source matrix
    assert set(map(tuple, bt["noise_rows"][:10])) <= set(map(tuple, x))


def test_multi_step_equals_sequential_single_steps():
    import map_tpu.models as models
    from map_tpu.config import TrainingArguments
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer
    from tests.conftest import base_model_config

    cfg = base_model_config(model_name="dnn")
    args = TrainingArguments(output_dir="/tmp/ms", learning_rate=1e-3,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 100, 0)
    rng = np.random.default_rng(0)
    batches = [{"input_ids": rng.integers(10, 400, (16, 8)).astype(np.int32),
                "labels": rng.integers(0, 2, 16).astype(np.float32),
                "weight": np.ones(16, np.float32)} for _ in range(4)]
    s1 = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                               batches[0])
    s2 = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0),
                               batches[0])
    step, _ = ts.make_supervised_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    multi = ts.make_multi_step(step, 4)

    losses_seq = []
    for bt in batches:
        s1, m = step(s1, bt)
        losses_seq.append(float(m["loss"]))
    stacked = {k: np.stack([bt[k] for bt in batches]) for k in batches[0]}
    s2, ms = multi(s2, stacked)
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses_seq,
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fast_forward_reproduces_stream():
    """epoch(start_batch=k) must yield exactly the batches k.. of a full
    epoch, including the noise_rows side-channel draws (O(1)-skip resume)."""
    from map_tpu.data.loader import Batcher

    rng = np.random.default_rng(3)
    X = rng.integers(10, 500, (103, 6)).astype(np.int32)
    Y = rng.integers(0, 2, 103).astype(np.float32)
    b = Batcher(X, Y, batch_size=16, shuffle=True, seed=11,
                noise_source=X, noise_rows_per_example=2)
    full = list(b.epoch(epoch=5))
    for skip in (1, 3, len(full) - 1):
        tail = list(b.epoch(epoch=5, start_batch=skip))
        assert len(tail) == len(full) - skip
        for got, want in zip(tail, full[skip:]):
            for k in want:
                np.testing.assert_array_equal(got[k], want[k])


def test_epoch_stacked_matches_per_batch():
    """Group-vectorized assembly (epoch_stacked) must reproduce the
    per-batch epoch() stream bit-exactly — including the shared noise draw
    stream, the padded tail batch, and start_batch fast-forward."""
    import numpy as np

    from map_tpu.data.loader import Batcher

    rng = np.random.default_rng(3)
    x = rng.integers(10, 500, (1010, 5)).astype(np.int32)
    y = rng.random(1010).astype(np.float32)
    for emit, v2, skip in ((False, False, 0), (True, False, 0),
                           (True, True, 0), (False, False, 3)):
        a = Batcher(x, y, 64, shuffle=True, seed=9, noise_source=x,
                    noise_rows_per_example=2)
        b = Batcher(x, y, 64, shuffle=True, seed=9, noise_source=x,
                    noise_rows_per_example=2)
        a.emit_indices = b.emit_indices = emit
        a.emit_start_only = b.emit_start_only = v2
        spc = 4
        per_batch = list(a.epoch(1, start_batch=skip))
        flat = []
        for n, payload, views in b.epoch_stacked(spc, 1, start_batch=skip):
            if n == 1:
                flat.append(payload)
            else:
                assert len(views) == n
                for i in range(n):
                    flat.append({k: payload[k][i] for k in payload})
        assert len(flat) == len(per_batch)
        for ga, gb in zip(per_batch, flat):
            assert set(ga.keys()) == set(gb.keys()), (ga.keys(), gb.keys())
            for k in ga:
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k)
