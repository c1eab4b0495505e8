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


class H5Writer:
    """Chunk-appendable writer for the {name}.h5 contract (resizable
    datasets) — the streaming twin of write_ctr_h5 for >RAM preprocessing."""

    def __init__(self, data_dir: str, name: str, num_fields: int):
        self._f = h5py.File(os.path.join(data_dir, f"{name}.h5"), "w")
        self._x = self._f.create_dataset(
            "feat_ids", shape=(0, num_fields), maxshape=(None, num_fields),
            dtype=np.int32, chunks=(1 << 16, num_fields))
        self._y = self._f.create_dataset(
            "labels", shape=(0,), maxshape=(None,), dtype=np.int64,
            chunks=(1 << 18,))

    def append(self, feat_ids: np.ndarray, labels: np.ndarray) -> None:
        n0 = self._x.shape[0]
        n = len(labels)
        self._x.resize(n0 + n, axis=0)
        self._y.resize(n0 + n, axis=0)
        self._x[n0:] = feat_ids
        self._y[n0:] = labels

    def close(self) -> int:
        n = self._x.shape[0]
        self._f.close()
        return n


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


def h5_dims(data_dir: str, name: str) -> Tuple[int, int]:
    """(rows, fields) WITHOUT loading the data — the >RAM-mode decision
    input (h5py reads only the dataset header)."""
    with h5py.File(os.path.join(data_dir, f"{name}.h5"), "r") as f:
        return tuple(f["feat_ids"].shape)


def h5_matrix_info(data_dir: str, name: str) -> Tuple[int, int, int]:
    """(rows, fields, stored itemsize) from the h5 header only. The stored
    dtype matters to the in-RAM peak model: an int64 h5 (numpy's default in
    the preprocessing writers) transiently holds 8 bytes/element alongside
    the int32 working copy."""
    with h5py.File(os.path.join(data_dir, f"{name}.h5"), "r") as f:
        fx = f["feat_ids"]
        return fx.shape[0], fx.shape[1], int(fx.dtype.itemsize)


def _mmap_paths(data_dir: str, name: str, split: str):
    base = os.path.join(data_dir, f"{name}-{split}")
    return base + "-X.i32.mmap", base + "-Y.f32.mmap"


def materialize_split_memmaps(data_dir: str, name: str,
                              splits: Dict[str, np.ndarray],
                              chunk_rows: int = 1 << 20) -> None:
    """One-time conversion of the h5 + split indices into per-split
    row-major memmap files, CHUNKED so peak host RAM stays ~chunk_rows
    regardless of dataset size (the >RAM loading mode, SURVEY §7; the
    reference loads everything into RAM, code/dataset.py:27-29).

    Multi-process safe: one process wins the .lock (O_EXCL) and writes;
    the rest poll for the .done marker. Files are written to .tmp then
    renamed, so a crashed writer never leaves a half-file looking valid."""
    import time

    done = os.path.join(data_dir, f"{name}-mmap.done")
    if os.path.exists(done):
        return
    lock = os.path.join(data_dir, f"{name}-mmap.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        while not os.path.exists(done):  # another process is writing
            time.sleep(0.5)
        return
    try:
        with h5py.File(os.path.join(data_dir, f"{name}.h5"), "r") as f:
            fx, fy = f["feat_ids"], f["labels"]
            total, nf = fx.shape
            # inverse maps: h5 row -> (owning split, position within split).
            # Splits are shuffled, so fancy-READING a split's rows degrades
            # into millions of tiny h5 hyperslabs; instead stream the h5
            # SEQUENTIALLY and scatter-write into the split memmaps — the
            # page cache absorbs the scattered writes (total dirty bytes =
            # dataset size).
            split_names = list(splits)
            split_of = np.full(total, -1, np.int8)
            pos_of = np.empty(total, np.int64)
            mms = {}
            for si, split in enumerate(split_names):
                idx = np.asarray(splits[split], np.int64)
                split_of[idx] = si
                pos_of[idx] = np.arange(len(idx))
                xp, yp = _mmap_paths(data_dir, name, split)
                mms[si] = (
                    np.memmap(xp + ".tmp", np.int32, "w+",
                              shape=(len(idx), nf)),
                    np.memmap(yp + ".tmp", np.float32, "w+",
                              shape=(len(idx),)))
            for i in range(0, total, chunk_rows):
                cx = fx[i:i + chunk_rows]
                cy = fy[i:i + chunk_rows]
                so = split_of[i:i + chunk_rows]
                po = pos_of[i:i + chunk_rows]
                for si in mms:
                    m = so == si
                    xm, ym = mms[si]
                    xm[po[m]] = cx[m]
                    ym[po[m]] = cy[m]
            for si, split in enumerate(split_names):
                xm, ym = mms[si]
                xm.flush()
                ym.flush()
                del xm, ym
                xp, yp = _mmap_paths(data_dir, name, split)
                os.replace(xp + ".tmp", xp)
                os.replace(yp + ".tmp", yp)
        with open(done, "w") as f:
            f.write("ok")
    finally:
        os.remove(lock)


def open_split_memmaps(data_dir: str, name: str, split: str, num_fields: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Read-only memmaps of a materialized split. Multiple processes map the
    SAME file, sharing the OS page cache instead of each holding a copy."""
    xp, yp = _mmap_paths(data_dir, name, split)
    x = np.memmap(xp, np.int32, "r").reshape(-1, num_fields)
    y = np.memmap(yp, np.float32, "r")
    return x, y


def h5_field_ranges(data_dir: str, name: str, chunk_rows: int = 1 << 20
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked per-field (min, max+1) over ALL h5 rows (the id-range pass
    the in-RAM path does on the loaded matrix)."""
    with h5py.File(os.path.join(data_dir, f"{name}.h5"), "r") as f:
        fx = f["feat_ids"]
        lo = None
        for i in range(0, fx.shape[0], chunk_rows):
            c = fx[i:i + chunk_rows]
            clo, chi = c.min(axis=0), c.max(axis=0)
            if lo is None:
                lo, hi = clo, chi
            else:
                lo, hi = np.minimum(lo, clo), np.maximum(hi, chi)
    return lo.astype(np.int32), (hi + 1).astype(np.int32)


def compute_feat_count(train_feat_ids: np.ndarray, vocab_size: int) -> np.ndarray:
    """Global per-feature frequency over the train split (dataset.py:49-62)."""
    return np.bincount(train_feat_ids.ravel(), minlength=vocab_size).astype(np.float32)
