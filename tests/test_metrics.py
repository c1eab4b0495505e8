"""AUC / LogLoss parity with sklearn (the reference's metric implementation,
`code/trainer.py:193-195`)."""

import numpy as np
import pytest
from sklearn.metrics import log_loss, roc_auc_score

from map_tpu.utils.metrics import binary_log_loss, roc_auc, sigmoid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 5000)
    s = rng.normal(size=5000)
    assert abs(roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_auc_with_ties():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, 5000)
    s = rng.integers(0, 10, 5000).astype(np.float64) / 10  # heavy ties
    assert abs(roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_logloss_matches_sklearn():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 2000)
    p = np.clip(rng.random(2000), 1e-9, 1 - 1e-9)
    assert abs(binary_log_loss(y, p) - log_loss(y, p)) < 1e-12


def test_logloss_clipping_extremes():
    y = np.array([1, 0, 1, 0])
    p = np.array([1.0, 0.0, 0.5, 0.5])
    assert abs(binary_log_loss(y, p) - log_loss(y, p)) < 1e-9


def test_sigmoid_stable():
    x = np.array([-1000.0, -10.0, 0.0, 10.0, 1000.0])
    s = sigmoid(x)
    assert np.all(np.isfinite(s))
    assert abs(s[2] - 0.5) < 1e-15
