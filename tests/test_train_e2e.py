"""End-to-end integration: scratch / MFP / RFD / finetune on synthetic data
(SURVEY.md §4 tier 2)."""

import glob
import os
import re

import numpy as np
import pytest

from map_tpu.run import main


def _common(tmp, synth_dir, extra):
    return [
        "--model_name", "dcnv2", "--output_dir", str(tmp),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--per_device_train_batch_size", "256",
        "--per_device_eval_batch_size", "512",
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--logging_steps", "50",
        "--hidden_dropout_rate", "0.0", "--proj_size", "8",
    ] + extra


def test_scratch_learns_and_completes(tmp_path, synth_dir):
    rc = main(_common(tmp_path, synth_dir, [
        "--learning_rate", "1e-2", "--num_train_epochs", "2",
        "--lr_sched", "const", "--weight_decay", "0.1"]))
    assert rc == 0
    assert os.path.exists(tmp_path / "results.log")  # completion marker
    log = open(tmp_path / "train.log").read()
    aucs = [float(x) for x in re.findall(r"'eval_auc': ([\d.]+)", log)]
    assert aucs and max(aucs) > 0.60  # learns well above chance
    assert glob.glob(str(tmp_path / "*.model"))  # best checkpoint saved


def test_idempotency_marker(tmp_path, synth_dir):
    (tmp_path / "results.log").write_text("done")
    rc = main(_common(tmp_path, synth_dir, ["--num_train_epochs", "1"]))
    assert rc == 0  # exits immediately (run.py:20-22 contract)
    assert not glob.glob(str(tmp_path / "*.model"))


def test_mfp_pretrain_then_finetune(tmp_path, synth_dir):
    pt_dir = tmp_path / "pt"
    rc = main(_common(pt_dir, synth_dir, [
        "--pretrain", "--pt_type", "MFP", "--sampling_method", "randint",
        "--mask_ratio", "0.3", "--pt_neg_num", "5",
        "--learning_rate", "1e-3", "--num_train_epochs", "1",
        "--lr_sched", "cosine", "--weight_decay", "0.05"]))
    assert rc == 0
    ckpts = glob.glob(str(pt_dir / "*.model"))
    assert len(ckpts) == 1  # saved once at pretrain end (trainer.py:349-350)
    log = open(pt_dir / "train.log").read()
    accs = [float(x) for x in re.findall(r"'eval_mfp_acc': ([\d.]+)", log)]
    assert accs and accs[-1] > 1.0 / 6  # better than 1-in-(1+k) chance

    ft_dir = tmp_path / "ft"
    rc = main(_common(ft_dir, synth_dir, [
        "--finetune", "--pretrained_model_path", ckpts[0],
        "--learning_rate", "1e-2", "--num_train_epochs", "1",
        "--lr_sched", "const", "--weight_decay", "0.1"]))
    assert rc == 0
    ft_log = open(ft_dir / "train.log").read()
    assert "finetune restore" in ft_log
    m = re.search(r"finetune restore: (\d+) tensors loaded, (\d+) skipped", ft_log)
    assert int(m.group(1)) > 0 and int(m.group(2)) > 0  # heads dropped


def test_rfd_pretrain(tmp_path, synth_dir):
    rc = main(_common(tmp_path, synth_dir, [
        "--pretrain", "--pt_type", "RFD", "--RFD_replace", "Unigram",
        "--sampling_method", "normal", "--mask_ratio", "0.3",
        "--learning_rate", "1e-3", "--num_train_epochs", "1",
        "--lr_sched", "cosine", "--weight_decay", "0.05"]))
    assert rc == 0
    log = open(tmp_path / "train.log").read()
    accs = [float(x) for x in re.findall(r"'eval_rfd_acc': ([\d.]+)", log)]
    assert accs and accs[-1] > 0.6


def test_device_resident_data_matches_host_pipeline(tmp_path, synth_dir):
    """Device-resident train data (ship indices, gather rows in-step) must
    reproduce the host-gather pipeline exactly: same eval AUCs, same final
    test metrics. The rng stream (shuffle order, RFD noise draws) is
    consumed identically by construction (loader.py emit_indices)."""
    logs = {}
    for mode in ("on", "off"):
        out = tmp_path / f"res_{mode}"
        rc = main(_common(out, synth_dir, [
            "--learning_rate", "1e-2", "--num_train_epochs", "1",
            "--lr_sched", "const", "--weight_decay", "0.1",
            "--device_resident_data", mode]))
        assert rc == 0
        logs[mode] = open(out / "train.log").read()
    for key in ("eval_auc", "eval_loss"):
        a = re.findall(rf"'{key}': ([\d.eE+-]+)", logs["on"])
        b = re.findall(rf"'{key}': ([\d.eE+-]+)", logs["off"])
        assert a and a == b, (key, a, b)


def test_device_resident_rfd_unigram_matches(tmp_path, synth_dir):
    """RFD-Unigram routes its noise ROWS through the resident matrix too
    (noise_index side-channel) — stream equality with the host pipeline."""
    logs = {}
    for mode in ("on", "off"):
        out = tmp_path / f"rfd_{mode}"
        rc = main(_common(out, synth_dir, [
            "--pretrain", "--pt_type", "RFD", "--RFD_replace", "Unigram",
            "--sampling_method", "randint", "--mask_ratio", "0.3",
            "--learning_rate", "1e-3", "--num_train_epochs", "1",
            "--lr_sched", "cosine", "--weight_decay", "0.05",
            "--device_resident_data", mode]))
        assert rc == 0
        logs[mode] = open(out / "train.log").read()
    for key in ("eval_rfd_loss", "eval_rfd_acc"):
        a = re.findall(rf"'{key}': ([\d.eE+-]+)", logs["on"])
        b = re.findall(rf"'{key}': ([\d.eE+-]+)", logs["off"])
        assert a and a == b, (key, a, b)
