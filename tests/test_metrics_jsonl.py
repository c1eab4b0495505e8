"""Structured metrics stream: every window/eval/test log line is mirrored to
{output_dir}/metrics.jsonl as strict JSON (framework addition; the
reference's only machine-readable output is the end-of-run pandas table,
code/trainer.py:160-161)."""

import json
import math
import os
import re

import pytest

from map_tpu.run import main


def _common(tmp, synth_dir, extra):
    return [
        "--model_name", "dcnv2", "--output_dir", str(tmp),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        # conftest forces an 8-virtual-device CPU mesh: per-device 32 keeps
        # the global batch at 256 so several logging windows fire per epoch
        "--per_device_train_batch_size", "32",
        "--per_device_eval_batch_size", "512",
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--logging_steps", "5",
        "--hidden_dropout_rate", "0.0", "--proj_size", "8",
    ] + extra


def _read(out_dir):
    path = os.path.join(str(out_dir), "metrics.jsonl")
    assert os.path.exists(path)
    with open(path) as f:
        return [json.loads(line) for line in f]  # strict JSON, every line


def test_supervised_metrics_stream(tmp_path, synth_dir):
    rc = main(_common(tmp_path, synth_dir, [
        "--learning_rate", "1e-2", "--num_train_epochs", "2",
        "--lr_sched", "const", "--weight_decay", "0.1"]))
    assert rc == 0
    recs = _read(tmp_path)
    kinds = [r["kind"] for r in recs]
    assert "train_window" in kinds and "eval" in kinds and kinds[-1] == "test"
    for r in recs:
        assert isinstance(r["step"], int) and "time" in r
    win = next(r for r in recs if r["kind"] == "train_window")
    assert {"window_auc", "window_loss", "examples_per_sec"} <= set(win)
    ev = next(r for r in recs if r["kind"] == "eval")
    assert {"eval_auc", "eval_loss", "learning_rate"} <= set(ev)
    # the stream mirrors train.log's eval lines exactly
    log = open(tmp_path / "train.log").read()
    log_aucs = [float(x) for x in re.findall(r"'eval_auc': ([\d.]+)", log)]
    jsonl_aucs = [r["eval_auc"] for r in recs if r["kind"] in ("eval", "test")]
    assert len(jsonl_aucs) == len(log_aucs)
    for a, b in zip(jsonl_aucs, log_aucs):
        assert a == pytest.approx(b)


def test_mfp_metrics_stream(tmp_path, synth_dir):
    rc = main(_common(tmp_path, synth_dir, [
        "--pretrain", "--pt_type", "MFP", "--sampling_method", "randint",
        "--mask_ratio", "0.3", "--pt_neg_num", "5",
        "--learning_rate", "1e-3", "--num_train_epochs", "1",
        "--lr_sched", "cosine", "--weight_decay", "0.05"]))
    assert rc == 0
    recs = _read(tmp_path)
    kinds = {r["kind"] for r in recs}
    assert "mfp_window" in kinds and "mfp_eval" in kinds
    ev = next(r for r in recs if r["kind"] == "mfp_eval")
    assert {"eval_mfp_loss", "eval_mfp_acc"} <= set(ev)


def test_nonfinite_floats_become_null(tmp_path, synth_dir):
    """Direct emitter check: nan/inf must serialize as strict-JSON null."""
    import map_tpu.models as models
    from map_tpu.config import TrainingArguments
    from map_tpu.data.dataset import CTRDataset
    from map_tpu.train.trainer import Trainer
    from tests.conftest import base_model_config

    args = TrainingArguments(
        output_dir=str(tmp_path), dataset_name="synth", data_dir=synth_dir,
        per_device_train_batch_size=256, learning_rate=1e-3)
    ds = CTRDataset(args)
    cfg = base_model_config(input_size=ds.input_size,
                            num_fields=ds.num_fields)
    t = Trainer(models.from_config(cfg), cfg, args, ds)
    t._emit_metrics("train_window", {"window_auc": float("nan"),
                                     "window_loss": math.inf, "ok": 1.5})
    (rec,) = _read(tmp_path)
    assert rec["window_auc"] is None and rec["window_loss"] is None
    assert rec["ok"] == 1.5
