"""Async checkpoint writer (train/async_writer.py): background saves must be
byte-identical to synchronous saves, donation-safe while training continues,
and strictly ordered before any checkpoint read.

The reference blocks its loop in torch.save (code/trainer.py:517-519); this
framework overlaps the D2H + serialize + write with training.
"""

import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import map_tpu.models as models
from map_tpu.config import TrainingArguments
from map_tpu.train import checkpoints
from map_tpu.train.async_writer import AsyncCheckpointWriter, snapshot_device_tree
from map_tpu.train.trainer import Trainer
from map_tpu.data.dataset import CTRDataset
from tests.conftest import base_model_config


def _make_trainer(synth_dir, out_dir, **overrides):
    kwargs = dict(
        output_dir=str(out_dir), dataset_name="synth", data_dir=synth_dir,
        per_device_train_batch_size=256, per_device_eval_batch_size=512,
        learning_rate=1e-3, weight_decay=0.1, lr_sched="const",
        num_train_epochs=1, logging_steps=1000, warmup_ratio=0.0,
        max_grad_norm=0.0, seed=42, save_steps=2)
    kwargs.update(overrides)
    args = TrainingArguments(**kwargs)
    ds = CTRDataset(args)
    cfg = base_model_config(model_name="dcnv2", input_size=ds.input_size,
                            num_fields=ds.num_fields)
    model = models.from_config(cfg)
    return Trainer(model, cfg, args, ds), args


def test_async_sync_runs_identical(tmp_path, synth_dir):
    """Full run with async saves (default write-offload mode) == full run
    with sync saves: same params, and the persisted checkpoint/resume files
    hold the same tensors."""
    t_async, args_a = _make_trainer(synth_dir, tmp_path / "a",
                                    async_checkpoint=True, save_steps=1)
    t_async.train()
    t_sync, args_s = _make_trainer(synth_dir, tmp_path / "s",
                                   async_checkpoint=False, save_steps=1)
    t_sync.train()

    for a, b in zip(jax.tree.leaves(jax.device_get(t_async.state.params)),
                    jax.tree.leaves(jax.device_get(t_sync.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the best-eval checkpoints on disk are byte-identical
    step = t_async.best_eval_step
    assert step == t_sync.best_eval_step and step > 0
    pa = checkpoints.model_checkpoint_path(args_a.output_dir, step)
    ps = checkpoints.model_checkpoint_path(args_s.output_dir, step)
    with open(pa, "rb") as f:
        ba = f.read()
    with open(ps, "rb") as f:
        bs = f.read()
    assert ba == bs

    # resume.state carries the same tensors under both modes
    ra, ma = checkpoints.load_train_state(
        args_a.output_dir, jax.device_get(t_async.state))
    rs, ms = checkpoints.load_train_state(
        args_s.output_dir, jax.device_get(t_sync.state))
    assert ma["global_step"] == ms["global_step"]
    for a, b in zip(jax.tree.leaves(ra), jax.tree.leaves(rs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the opt-in full-async fetch mode (async_checkpoint_fetch: worker-thread
    # D2H over a donation-safe snapshot) writes the same bytes too
    t_fetch, args_f = _make_trainer(synth_dir, tmp_path / "f",
                                    async_checkpoint=True,
                                    async_checkpoint_fetch=True, save_steps=1)
    t_fetch.train()
    assert t_fetch.best_eval_step == step
    pf = checkpoints.model_checkpoint_path(args_f.output_dir, step)
    with open(pf, "rb") as f:
        bf = f.read()
    assert bf == bs


def test_snapshot_survives_donation(synth_dir, tmp_path):
    """The on-device snapshot must outlive donation of the live state: step
    once after snapshotting, then read the snapshot."""
    t, _ = _make_trainer(synth_dir, tmp_path / "d", save_steps=10 ** 9)
    batcher = t.get_batcher("train", True)
    t._build_steps(len(batcher))
    stream = t._train_stream(batcher.epoch(0))
    n, dev_batch, _ = next(stream)
    t._run_train_step(n, dev_batch)  # materialize state once

    snap = snapshot_device_tree(t.state)
    before = jax.device_get(snap.params)
    # the next dispatch donates t.state's buffers
    n, dev_batch, _ = next(stream)
    t._run_train_step(n, dev_batch)
    after = jax.device_get(snap.params)  # must NOT raise deleted-buffer
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and it differs from the post-step live state (the copy is a snapshot,
    # not an alias)
    live = jax.device_get(t.state.params)
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(live))]
    assert any(diffs)


def test_writer_ordering_and_errors(tmp_path):
    """submit() joins the in-flight job (FIFO, depth-1) and worker exceptions
    re-raise on the main thread at the next wait()/submit()."""
    w = AsyncCheckpointWriter()
    order = []
    gate = threading.Event()

    def slow():
        gate.wait(5.0)
        order.append("slow")

    w.submit(slow, label="slow")
    assert w.busy
    gate.set()
    w.submit(lambda: order.append("fast"), label="fast")  # joins slow first
    w.wait()
    assert order == ["slow", "fast"]

    def boom():
        raise RuntimeError("disk full")

    w.submit(boom, label="boom")
    with pytest.raises(RuntimeError, match="disk full"):
        w.wait()
    w.wait()  # exception is consumed; writer reusable
    w.submit(lambda: order.append("again"))
    w.wait()
    assert order[-1] == "again"


def test_save_model_atomic_tmp_cleanup(tmp_path):
    """save_model writes via tmp+rename: no .tmp leftover, file readable."""
    vars_ = {"params": {"x": np.arange(6, dtype=np.float32)}}
    path = checkpoints.save_model(vars_, str(tmp_path), 7)
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")
    back = checkpoints.load_model(str(tmp_path), 7)
    np.testing.assert_array_equal(back["params"]["x"], vars_["params"]["x"])


def test_async_resume_roundtrip(tmp_path, synth_dir):
    """Interrupted run with ASYNC resume saves resumes exactly (the resume
    read waits for the in-flight write)."""
    t_full, _ = _make_trainer(synth_dir, tmp_path / "full",
                              num_train_epochs=2, save_steps=1)
    t_full.train()
    full_steps = t_full.global_step

    t_part, args_b = _make_trainer(synth_dir, tmp_path / "part",
                                   num_train_epochs=1, save_steps=1)
    t_part.train()
    assert checkpoints.has_resume_state(args_b.output_dir)

    t_res, _ = _make_trainer(synth_dir, tmp_path / "part",
                             num_train_epochs=2, save_steps=1, resume=True)
    t_res.train()
    assert t_res.global_step == full_steps
    for a, b in zip(jax.tree.leaves(jax.device_get(t_full.state.params)),
                    jax.tree.leaves(jax.device_get(t_res.state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
