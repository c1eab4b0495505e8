"""Resident stream v2 (scalar-start batches + device-resident epoch
permutation) must reproduce the host pipeline bit-identically.

v2 engages only single-process/un-meshed (the conftest's 8-device virtual
mesh disables it in-process), so the A/B runs in subprocesses with
--mock_devices=1."""

import os
import re
import subprocess
import sys


def _run(tmp, synth_dir, tag, extra):
    out = tmp / tag
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # let --mock_devices set the virtual device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "map_tpu.run",
           "--model_name", "dcnv2", "--output_dir", str(out),
           "--dataset_name", "synth", "--data_dir", synth_dir,
           "--mock_devices", "1",
           "--per_device_train_batch_size", "256",
           "--per_device_eval_batch_size", "512",
           "--embed_size", "8", "--hidden_size", "32",
           "--num_hidden_layers", "1", "--num_cross_layers", "2",
           "--logging_steps", "50", "--hidden_dropout_rate", "0.0",
           "--learning_rate", "1e-2", "--num_train_epochs", "2",
           "--lr_sched", "const", "--weight_decay", "0.1"] + extra
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=420)
    assert p.returncode == 0, p.stderr[-3000:]
    log = open(out / "train.log").read()
    aucs = [x for x in re.findall(r"'eval_auc': ([\d.]+)", log)]
    return log, aucs


def test_stream_v2_matches_host_pipeline(tmp_path, synth_dir):
    log_v2, aucs_v2 = _run(tmp_path, synth_dir, "v2",
                           ["--device_resident_data", "on"])
    assert "batch number only (resident epoch permutation)" in log_v2
    log_host, aucs_host = _run(tmp_path, synth_dir, "host",
                               ["--device_resident_data", "off"])
    assert len(aucs_v2) == len(aucs_host) >= 2
    # bit-identical: same permutation, same gathers, same step program
    assert aucs_v2 == aucs_host, (aucs_v2, aucs_host)
