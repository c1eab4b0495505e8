"""Mid-run resume: a run killed at step k and resumed reproduces the
uninterrupted run exactly (framework addition over the reference, which has
no mid-run resume — SURVEY.md §5.3)."""

import numpy as np
import pytest

import jax

import map_tpu.models as models
from map_tpu.config import TrainingArguments
from map_tpu.train import checkpoints
from map_tpu.train.trainer import Trainer
from map_tpu.data.dataset import CTRDataset
from tests.conftest import base_model_config


class _Args(TrainingArguments):
    pass


def _make_trainer(synth_dir, out_dir, **overrides):
    kwargs = dict(
        output_dir=str(out_dir), dataset_name="synth", data_dir=synth_dir,
        per_device_train_batch_size=256, per_device_eval_batch_size=512,
        learning_rate=1e-3, weight_decay=0.1, lr_sched="const",
        num_train_epochs=1, logging_steps=1000, warmup_ratio=0.0,
        max_grad_norm=0.0, seed=42, save_steps=5)
    kwargs.update(overrides)
    args = TrainingArguments(**kwargs)
    ds = CTRDataset(args)
    cfg = base_model_config(model_name="dcnv2", input_size=ds.input_size,
                            num_fields=ds.num_fields)
    model = models.from_config(cfg)
    return Trainer(model, cfg, args, ds), args


def test_resume_state_roundtrip(tmp_path, synth_dir):
    """Uninterrupted 2-epoch run == 1-epoch run + resumed 2nd epoch."""
    t_full, _ = _make_trainer(synth_dir, tmp_path / "full",
                              num_train_epochs=2, save_steps=1)
    t_full.train()
    full_steps = t_full.global_step
    assert full_steps >= 2

    # "Interrupted" run: same seed, stops after epoch 1; resume.state is
    # written every step (save_steps=1).
    t_part, args_b = _make_trainer(synth_dir, tmp_path / "part",
                                   num_train_epochs=1, save_steps=1)
    t_part.train()
    assert checkpoints.has_resume_state(args_b.output_dir)
    assert t_part.global_step == full_steps // 2

    t_res, _ = _make_trainer(synth_dir, tmp_path / "part",
                             num_train_epochs=2, save_steps=1, resume=True)
    t_res.train()
    assert t_res.global_step == full_steps
    for a, b in zip(jax.tree.leaves(jax.device_get(t_full.state.params)),
                    jax.tree.leaves(jax.device_get(t_res.state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_save_total_limit_prunes(tmp_path):
    vars_ = {"params": {"x": np.zeros(3, np.float32)}}
    for step in (1, 2, 3, 4, 5):
        checkpoints.save_model(vars_, str(tmp_path), step)
    checkpoints.prune_checkpoints(str(tmp_path), keep=2)
    import glob
    left = sorted(glob.glob(str(tmp_path / "*.model")))
    assert len(left) == 2
    assert left[0].endswith("4.model") and left[1].endswith("5.model")
