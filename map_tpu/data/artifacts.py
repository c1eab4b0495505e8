"""On-disk artifact formats shared with the reference preprocessing output.

The contract (reference `data_preprocess/proc_avazu.py:272-288`,
`code/dataset.py:20-37`):
- `{name}.h5`        : datasets `feat_ids` (int matrix [N, num_fields]) and
                       `labels` (int vector [N]).
- `{name}-meta.json` : `field_names`, `feat_map` (feature string -> id),
                       `field_map` (field name -> index, first entry `<rsv>`).
- `split.pkl`        : pickle dict with `train_index` / `valid_index` /
                       `test_index` integer arrays.
- `feat-count.npy`   : cached global per-feature frequency over the train split
                       (the NCE noise distribution input; reference caches a
                       torch tensor at `code/dataset.py:49-62`).

Reserved id space (load-bearing invariants, `proc_avazu.py:213-220`):
`<pad>`=0, `<cls>`=1, `<sep>`=2, `<mask>`=3, `<unused0..5>`=4..9; per-field ids
are appended contiguously afterwards (field-blocked id space), each field
followed by its own `<oov>` id.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Tuple

import h5py
import numpy as np

RESERVED_TOKENS = ["<pad>", "<cls>", "<sep>", "<mask>"] + [f"<unused{i}>" for i in range(6)]
MASK_ID = 3
NUM_RESERVED = len(RESERVED_TOKENS)  # == 10
RSV_FIELD = "<rsv>"


def write_meta(data_dir: str, name: str, field_names: List[str],
               feat_map: Dict[str, int], field_map: Dict[str, int]) -> None:
    meta = {"field_names": field_names, "feat_map": feat_map, "field_map": field_map}
    with open(os.path.join(data_dir, f"{name}-meta.json"), "w") as f:
        json.dump(meta, f)


def read_meta(data_dir: str, name: str) -> Tuple[List[str], Dict[str, int], Dict[str, int]]:
    with open(os.path.join(data_dir, f"{name}-meta.json"), "r") as f:
        meta = json.load(f)
    return meta["field_names"], meta["feat_map"], meta["field_map"]


def write_ctr_h5(data_dir: str, name: str, feat_ids: np.ndarray, labels: np.ndarray) -> None:
    with h5py.File(os.path.join(data_dir, f"{name}.h5"), "w") as f:
        f.create_dataset("feat_ids", data=feat_ids)
        f.create_dataset("labels", data=labels)


def read_ctr_h5(data_dir: str, name: str) -> Tuple[np.ndarray, np.ndarray]:
    with h5py.File(os.path.join(data_dir, f"{name}.h5"), "r") as f:
        return f["feat_ids"][:], f["labels"][:]


def write_split(data_dir: str, splits: Dict[str, np.ndarray]) -> None:
    payload = {f"{k}_index": np.asarray(v) for k, v in splits.items()}
    with open(os.path.join(data_dir, "split.pkl"), "wb") as f:
        pickle.dump(payload, f)


def read_split(data_dir: str, split_names=("train", "valid", "test")) -> Dict[str, np.ndarray]:
    with open(os.path.join(data_dir, "split.pkl"), "rb") as f:
        split_index = pickle.load(f)
    return {s: np.asarray(split_index[f"{s}_index"]) for s in split_names}


def feat_count_path(data_dir: str) -> str:
    return os.path.join(data_dir, "feat-count.npy")


def compute_feat_count(train_feat_ids: np.ndarray, vocab_size: int) -> np.ndarray:
    """Global per-feature frequency over the train split (dataset.py:49-62)."""
    return np.bincount(train_feat_ids.ravel(), minlength=vocab_size).astype(np.float32)
