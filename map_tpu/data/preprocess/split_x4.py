"""Criteo/Avazu x4 split: StratifiedKFold(10, shuffle, seed 2018).

Parity: reference `data_preprocess/split_criteo_x4.py:15,29-37` — fold 0 =
test, fold 1 = valid, folds 2-9 = train. Written directly as `split.pkl` (the
file the dataset loader reads) instead of the reference's `split_x4.pkl`
which required a manual rename (SURVEY.md §5 defects).

NOTE on exact reproduction: the reference pins sklearn==0.19.1 because
StratifiedKFold's shuffle order changed across sklearn versions
(split_criteo_x4.py:8-13); with a modern sklearn the fold CONTENTS differ
from the md5-pinned reference csvs even at the same seed. The split
statistics (stratified 80/10/10) are identical.

Usage: python -m map_tpu.data.preprocess.split_x4 --labels <h5|csv> --out data/criteo
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from map_tpu.data import artifacts

RANDOM_SEED = 2018


def make_split(labels: np.ndarray, seed: int = RANDOM_SEED):
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
