"""Dataset access layer.

Parity with the reference `code/dataset.py:12-87`: loads meta json, the whole
`.h5` into host RAM, `split.pkl` indices, materializes per-split arrays, and
derives the pretraining statistics (unigram `feat_count`, per-field id ranges
for RFD-Uniform). The per-field range computation intentionally runs over ALL
rows (not just train) because validation features may be unseen in train
(reference comment at `code/dataset.py:66-67`); it also asserts every value is
inside its field block (`code/dataset.py:71`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from map_tpu.data import artifacts
from map_tpu.data.artifacts import NUM_RESERVED


class CTRDataset:
    """Loads the preprocessed CTR artifacts and exposes per-split arrays.

    Attributes mirror the reference BaseDataset: `feat_map`, `field_map`,
    `field_names`, `X[split]`, `Y[split]`, `feat_count`, `idx_low`, `idx_high`,
    `feat_num_per_field`.
    """

    split_names = ("train", "valid", "test")

    def __init__(self, args):
        self.args = args
        self.data_dir = args.data_dir
        self.dataset_name = args.dataset_name
        self.load_data()

    def load_data(self) -> None:
        self.field_names, self.feat_map, self.field_map = artifacts.read_meta(
            self.data_dir, self.dataset_name)
        splits = artifacts.read_split(self.data_dir, self.split_names)
        self.memory_mapped = self._over_host_budget()
        if self.memory_mapped:
            # >RAM mode (SURVEY §7; the reference loads the full matrix into
            # host RAM, code/dataset.py:27-29, which binds at Criteo-x4 scale
            # x process_count): one-time chunked conversion to per-split
            # row-major memmap files, then every process maps the same bytes
            # through the shared OS page cache. The Batcher's fancy-row
            # reads return ordinary ndarrays — the stream is bit-identical
            # to the in-RAM path (tests/test_memmap_dataset.py).
            artifacts.materialize_split_memmaps(
                self.data_dir, self.dataset_name, splits)
            nf = artifacts.h5_dims(self.data_dir, self.dataset_name)[1]
            self.X, self.Y = {}, {}
            for s in self.split_names:
                self.X[s], self.Y[s] = artifacts.open_split_memmaps(
                    self.data_dir, self.dataset_name, s, nf)
            self._load_feat_count()
            self.idx_low, self.idx_high = artifacts.h5_field_ranges(
                self.data_dir, self.dataset_name)
            self._derive_field_invariants()
            return
        feat_ids, labels = artifacts.read_ctr_h5(self.data_dir, self.dataset_name)
        feat_ids = np.ascontiguousarray(feat_ids.astype(np.int32))
        labels = np.ascontiguousarray(labels.astype(np.float32))

        self.X: Dict[str, np.ndarray] = {s: feat_ids[splits[s]] for s in self.split_names}
        self.Y: Dict[str, np.ndarray] = {s: labels[splits[s]] for s in self.split_names}

        self._load_feat_count()
        self._count_feat_per_field(feat_ids)

    def _over_host_budget(self) -> bool:
        """memmap-mode decision from the h5 HEADER only (nothing loaded).
        host_data_budget_mb: -1 = always in-RAM (reference parity), 0 = auto
        (60% of physical RAM), >0 = explicit budget. The in-RAM path briefly
        holds h5 matrix + per-split copies ~ 2x the matrix bytes."""
        budget_mb = int(getattr(self.args, "host_data_budget_mb", 0) or 0)
        if budget_mb < 0:
            return False
        rows, nf, itemsize = artifacts.h5_matrix_info(
            self.data_dir, self.dataset_name)
        # Peak in-RAM residency: the h5 load at its STORED dtype coexists
        # with the int32 working copy (load_data's astype), and the per-split
        # copies coexist with the full int32 matrix afterwards — so the peak
        # is max(stored, splits=4) + 4 bytes per element (an int64 h5 peaks
        # at 12 B/elem, not the 8 the old 2x-int32 model assumed; the
        # Criteo-x4 proof's ~50 GB RSS was exactly this).
        need = (max(itemsize, 4) + 4) * rows * nf
        if budget_mb == 0:
            try:
                budget = int(os.sysconf("SC_PHYS_PAGES")
                             * os.sysconf("SC_PAGE_SIZE") * 0.6)
            except (ValueError, OSError):  # pragma: no cover
                return False
        else:
            budget = budget_mb << 20
        return need > budget

    def _load_feat_count(self) -> None:
        """Unigram stats for the NCE noise distribution (dataset.py:49-62)."""
        if not getattr(self.args, "pretrain", False):
            self.feat_count: Optional[np.ndarray] = None
            return
        path = artifacts.feat_count_path(self.data_dir)
        if os.path.exists(path):
            self.feat_count = np.load(path)
        else:
            self.feat_count = artifacts.compute_feat_count(
                self.X["train"], len(self.feat_map))
            np.save(path, self.feat_count)

    def _count_feat_per_field(self, feat_ids: np.ndarray) -> None:
        """Per-field id ranges for RFD-Uniform sampling (dataset.py:64-75)
        and for per-field MFP candidate sampling (north-star upgrade)."""
        # Per-field id ranges. The reference computes these lazily for its
        # RFD-Uniform mode (dataset.py:71); here they are ALWAYS computed:
        # the field-blocked hybrid lookup (ops/hybrid_gather.py) keys off
        # them for every objective, and the in-block assert is exactly that
        # path's correctness contract.
        self.idx_low = feat_ids.min(axis=0).astype(np.int32)
        self.idx_high = (feat_ids.max(axis=0) + 1).astype(np.int32)
        self._derive_field_invariants()

    def _derive_field_invariants(self) -> None:
        self.feat_num_per_field = self.idx_high - self.idx_low
        # The hybrid lookup's actual contract (its small-field routing slices
        # blocks out of the table by these ranges): blocks must sit above the
        # reserved ids and be pairwise disjoint in ascending field order. A
        # dataset violating it (hand-built artifacts, overlapping id maps)
        # silently loses the invariant, so disable the hybrid path rather
        # than mis-route gradients. (The reference's own assert,
        # dataset.py:71, checks values against lazily-computed min/max and is
        # tautological when the ranges come from the same array.)
        # Floor = the same NUM_RESERVED constant the hybrid path's nresv
        # defaults to (models/zoo.py), so the two gates cannot disagree.
        ok = self.idx_low.min() >= NUM_RESERVED and bool(
            np.all(self.idx_low[1:] >= self.idx_high[:-1]))
        if not ok:
            self.field_blocked_ok = False
        else:
            self.field_blocked_ok = True

    @property
    def num_fields(self) -> int:
        return len(self.field_map) - 1  # minus the reserved <rsv> field (run.py:52)

    @property
    def input_size(self) -> int:
        return len(self.feat_map)

    def split_sizes(self) -> Dict[str, int]:
        return {s: len(self.Y[s]) for s in self.split_names}
