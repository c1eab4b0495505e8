"""Logging and the job-completion-marker contract.

Parity with the reference entry point (`code/run.py:17-37, 89-92`):
- logs stream to console and to `{output_dir}/train.log`;
- a run whose `{output_dir}/results.log` already exists is considered finished
  (idempotency check);
- on successful completion, train.log is copied to results.log.
"""

from __future__ import annotations

import logging
import os
import shutil
import sys


def setup_logging(output_dir: str, process_index: int = 0) -> logging.Logger:
    os.makedirs(output_dir, exist_ok=True)
    level = logging.INFO if process_index == 0 else logging.WARN
    root = logging.getLogger()
    root.setLevel(level)
    # Avoid duplicate handlers across repeated setup calls (tests).
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter("%(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    fh = logging.FileHandler(filename=train_log_path(output_dir), mode="w")
    fh.setFormatter(fmt)
    root.addHandler(fh)
    return root


def train_log_path(output_dir: str) -> str:
    return os.path.join(output_dir, "train.log")


def results_log_path(output_dir: str) -> str:
    return os.path.join(output_dir, "results.log")


def job_already_finished(output_dir: str) -> bool:
    return os.path.exists(results_log_path(output_dir))


def mark_job_finished(output_dir: str) -> None:
    shutil.copyfile(train_log_path(output_dir), results_log_path(output_dir))
