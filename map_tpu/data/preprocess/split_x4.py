"""Criteo/Avazu x4 split: StratifiedKFold(10, shuffle, seed 2018).

Parity: reference `data_preprocess/split_criteo_x4.py:15,29-37` — fold 0 =
test, fold 1 = valid, folds 2-9 = train. Written directly as `split.pkl` (the
file the dataset loader reads) instead of the reference's `split_x4.pkl`
which required a manual rename (SURVEY.md §5 defects).

Exact reproduction: the reference pins sklearn==0.19.1 because
StratifiedKFold's fold-assignment algorithm changed in sklearn 0.22
(split_criteo_x4.py:8-13). `stratified_kfold_legacy` below vendors the
0.19.1 algorithm (~30 lines: one shared RandomState, per-class KFold
shuffles consumed in class order, per-fold contiguous slices) so the
md5-pinned reference fold contents are reproducible under any modern
sklearn/numpy — numpy's RandomState.shuffle stream is version-stable.
`make_split(legacy=False)` keeps the modern-sklearn behavior for comparison.
The md5 check itself needs the raw Criteo csv (not obtainable offline);
tests/test_preprocess.py pins the vendored algorithm against modern KFold on
the class-restricted subproblems, which is the invariant the 0.19.1
algorithm is built from.

Usage: python -m map_tpu.data.preprocess.split_x4 --labels <h5|csv> --out data/criteo
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from map_tpu.data import artifacts

RANDOM_SEED = 2018


def _kfold_slices(n_samples: int, n_splits: int, rng: np.random.RandomState):
    """sklearn KFold(shuffle=True) test folds: one rng.shuffle of arange, then
    contiguous slices with the remainder spread over the first folds.
    This shape is identical in 0.19.1 and modern sklearn."""
    indices = np.arange(n_samples)
    rng.shuffle(indices)
    fold_sizes = np.full(n_splits, n_samples // n_splits, dtype=np.int64)
    fold_sizes[: n_samples % n_splits] += 1
    stops = np.cumsum(fold_sizes)
    return [indices[lo:hi] for lo, hi in zip(np.r_[0, stops[:-1]], stops)]


def stratified_kfold_legacy(y: np.ndarray, n_splits: int = 10,
                            seed: int = RANDOM_SEED) -> np.ndarray:
    """Vendored sklearn 0.19.1 StratifiedKFold(shuffle=True) fold assignment.

    Returns test_folds: per-sample fold index. 0.19.1 semantics
    (model_selection/_split.py of that release): one RandomState shared by
    ALL per-class KFolds; each class's shuffle consumes the stream lazily at
    the first zip() pull — i.e. in ascending class order; each class's
    KFold runs over max(count, n_splits) samples with oversized test splits
    clipped to the class size; fold k of the stratified split is the union
    of fold k of every class's KFold, mapped back through the class mask.
    """
    rng = np.random.RandomState(seed)
    y = np.asarray(y)
    unique_y, y_inversed = np.unique(y, return_inverse=True)
    y_counts = np.bincount(y_inversed)
    per_cls = [_kfold_slices(max(int(c), n_splits), n_splits, rng)
               for c in y_counts]
    test_folds = np.zeros(y.shape[0], dtype=np.int64)
    for fold_idx in range(n_splits):
        for cls_idx in range(len(unique_y)):
            mask = y_inversed == cls_idx
            cls_len = int(y_counts[cls_idx])
            test_split = per_cls[cls_idx][fold_idx]
            test_split = test_split[test_split < cls_len]
            cls_test_folds = test_folds[mask]
            cls_test_folds[test_split] = fold_idx
            test_folds[mask] = cls_test_folds
    return test_folds


# regression pin for tests/test_preprocess.py::test_legacy_split_deterministic_pin
stratified_kfold_legacy.__test_pin__ = "d68945aee9fcc1a88709b05ffd24d1d0"


def make_split(labels: np.ndarray, seed: int = RANDOM_SEED,
               legacy: bool = True):
    if legacy:
        test_folds = stratified_kfold_legacy(labels, 10, seed)
        # split() yields each fold's test indices in ascending order
        fold_indexes = [np.flatnonzero(test_folds == k) for k in range(10)]
    else:
        from sklearn.model_selection import StratifiedKFold

        folds = StratifiedKFold(n_splits=10, shuffle=True, random_state=seed
                                ).split(np.zeros_like(labels), labels)
        fold_indexes = [valid_id for _, valid_id in folds]
    return {
        "test": fold_indexes[0],
        "valid": fold_indexes[1],
        "train": np.concatenate(fold_indexes[2:]),
    }


def run(labels_path: str, out_dir: str, name: str = "criteo") -> None:
    if labels_path.endswith(".h5"):
        import h5py

        with h5py.File(labels_path, "r") as f:
            labels = f["labels"][:]
    else:
        labels = np.loadtxt(labels_path, dtype=np.int64)
    splits = make_split(np.asarray(labels).astype(np.int64))
    os.makedirs(out_dir, exist_ok=True)
    artifacts.write_split(out_dir, splits)
    sizes = {k: len(v) for k, v in splits.items()}
    print(f"split written: {sizes}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--labels", required=True, help=".h5 with labels or text file")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    run(a.labels, a.out)


if __name__ == "__main__":
    main()
