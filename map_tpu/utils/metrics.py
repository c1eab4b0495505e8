"""Exact evaluation metrics, computed host-side in float64.

The reference computes AUC and LogLoss with sklearn on the full split
(`code/trainer.py:193-195`). We re-implement both so the framework has no
sklearn dependency on the hot path; `tests/test_metrics.py` pins equality with
sklearn to ~1e-12.
"""

from __future__ import annotations

import numpy as np


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Exact ROC AUC via the Mann-Whitney U statistic with average ranks for ties.

    Equivalent to sklearn.metrics.roc_auc_score for binary labels.
    """
    y_true = np.asarray(y_true).ravel().astype(np.int64)
    y_score = np.asarray(y_score).ravel().astype(np.float64)
    n_pos = int(y_true.sum())
    n_neg = y_true.size - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc requires both classes present")

    order = np.argsort(y_score, kind="mergesort")
    sorted_scores = y_score[order]
    # Average ranks (1-based) with ties sharing the mean rank of their block.
    ranks = np.empty(y_score.size, dtype=np.float64)
    # Block boundaries of equal scores.
    boundary = np.empty(y_score.size + 1, dtype=bool)
    boundary[0] = True
    boundary[-1] = True
    boundary[1:-1] = sorted_scores[1:] != sorted_scores[:-1]
    idx = np.flatnonzero(boundary)
    starts, ends = idx[:-1], idx[1:]
    # mean of 1-based ranks in [start, end)
    block_rank = (starts + ends + 1) / 2.0
    block_sizes = ends - starts
    ranks[order] = np.repeat(block_rank, block_sizes)

    rank_sum_pos = ranks[y_true == 1].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def binary_log_loss(y_true: np.ndarray, y_prob: np.ndarray) -> float:
    """Binary cross-entropy on probabilities, matching sklearn.metrics.log_loss.

    sklearn clips probabilities to [eps, 1-eps] with eps = float64 machine
    epsilon (its 'auto' default).
    """
    y_true = np.asarray(y_true).ravel().astype(np.float64)
    y_prob = np.asarray(y_prob).ravel().astype(np.float64)
    eps = np.finfo(np.float64).eps
    p = np.clip(y_prob, eps, 1.0 - eps)
    return float(-np.mean(y_true * np.log(p) + (1.0 - y_true) * np.log(1.0 - p)))


def auc_from_histograms(hist_pos: np.ndarray, hist_neg: np.ndarray) -> float:
    """ROC AUC from per-bucket positive/negative counts (buckets ascending by
    score). Scores within a bucket are treated as tied (rank-averaged), so this
    is exact when every bucket holds a single distinct score and otherwise a
    bucketed estimator with error O(1/num_bins).

    This is the reduction for the streaming-AUC eval mode: the device
    accumulates the two histograms per batch (`--streaming_auc`) so billion-row
    evals never materialize per-example scores on the host (reference
    counterpart: sklearn roc_auc_score over the full split,
    `code/trainer.py:193-195`).
    """
    hist_pos = np.asarray(hist_pos, dtype=np.float64).ravel()
    hist_neg = np.asarray(hist_neg, dtype=np.float64).ravel()
    n_pos = hist_pos.sum()
    n_neg = hist_neg.sum()
    if n_pos == 0 or n_neg == 0:
        raise ValueError("auc_from_histograms requires both classes present")
    cum_neg_below = np.cumsum(hist_neg) - hist_neg
    u = np.sum(hist_pos * (cum_neg_below + 0.5 * hist_neg))
    return float(u / (n_pos * n_neg))


def auc_histogram_error_bound(hist_pos: np.ndarray, hist_neg: np.ndarray
                              ) -> float:
    """Certified worst-case |exact_AUC - auc_from_histograms|.

    The estimator is exact for every pos/neg pair in DIFFERENT bins; a
    same-bin pair contributes 0.5/(P*N) while its true contribution is in
    [0, 1/(P*N)], so the error is at most half the same-bin pair mass:
        bound = 0.5 * sum_b pos_b * neg_b / (P * N).
    This is computed per eval from the same histograms (free), letting the
    trainer certify that streaming-mode model selection cannot mis-rank
    checkpoints whose AUC gap exceeds 2 * bound.
    """
    hist_pos = np.asarray(hist_pos, dtype=np.float64).ravel()
    hist_neg = np.asarray(hist_neg, dtype=np.float64).ravel()
    n_pos, n_neg = hist_pos.sum(), hist_neg.sum()
    if n_pos == 0 or n_neg == 0:
        return 0.0
    return float(0.5 * np.sum(hist_pos * hist_neg) / (n_pos * n_neg))


def sigmoid(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out
