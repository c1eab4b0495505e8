"""Shared vocabulary construction for the offline preprocessing pipelines.

Reproduces the reference's id-space invariants
(`data_preprocess/proc_avazu.py:210-251`, `proc_criteo.py:106-153`):
- 10 reserved ids (`<pad>`=0 `<cls>`=1 `<sep>`=2 `<mask>`=3 `<unused0..5>`);
- `field_map` headed by the reserved `<rsv>` field;
- per field, values with count >= n_core get ids appended CONTIGUOUSLY in
  descending-frequency order, followed by one per-field `<oov>` id — the
  field-blocked contiguous id space that RFD-Uniform sampling relies on
  (`code/dataset.py:64-75`).

Implementation is vectorized (pandas factorize + numpy) instead of the
reference's per-row Python loops — the whole Criteo pass is a few
column-level operations.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from map_tpu.data.artifacts import NUM_RESERVED, RESERVED_TOKENS, RSV_FIELD


def encode_field(values: np.ndarray, field_name: str, n_core: int,
                 feat_map: Dict[str, int]) -> np.ndarray:
    """Assign ids for one field's raw values; extends feat_map in place.

    Values with frequency >= n_core get contiguous ids in descending-frequency
    order; everything else maps to the field's trailing `<oov>` id.
    """
    s = pd.Series(values)
    codes, uniques = pd.factorize(s, sort=False)
    counts = np.bincount(codes[codes >= 0], minlength=len(uniques))
    # descending frequency; stable so first-seen wins ties (Counter.most_common)
    order = np.argsort(-counts, kind="stable")
    kept = order[counts[order] >= n_core]

    base = len(feat_map)
    for rank, uidx in enumerate(kept.tolist()):
        feat_map[f"{field_name}-{uniques[uidx]}"] = base + rank
    oov_id = base + len(kept)
    feat_map[f"{field_name}-<oov>"] = oov_id

    # code -> id lookup table
    lut = np.full(len(uniques) + 1, oov_id, dtype=np.int64)
    lut[kept] = base + np.arange(len(kept))
    codes = np.where(codes < 0, len(uniques), codes)  # NaN codes -> oov
    return lut[codes]


def build_dataset_arrays(columns: Dict[str, np.ndarray], n_core: int
                         ) -> Tuple[np.ndarray, Dict[str, int], Dict[str, int], List[str]]:
    """Build (feat_ids [N, F], feat_map, field_map, field_names)."""
    feat_map = {tok: i for i, tok in enumerate(RESERVED_TOKENS)}
    assert len(feat_map) == NUM_RESERVED
    field_map = {RSV_FIELD: 0}
    field_names: List[str] = []
    cols = []
    for name, values in columns.items():
        field_map[name] = len(field_map)
        field_names.append(name)
        cols.append(encode_field(values, name, n_core, feat_map))
    feat_ids = np.stack(cols, axis=1).astype(np.int32)
    return feat_ids, feat_map, field_map, field_names


def verify_field_blocked(feat_ids: np.ndarray, field_map: Dict[str, int]) -> None:
    """Asserts the contiguous-per-field invariant RFD-Uniform depends on."""
    lows = feat_ids.min(axis=0)
    highs = feat_ids.max(axis=0)
    for f in range(feat_ids.shape[1] - 1):
        assert highs[f] < lows[f + 1] or highs[f] < NUM_RESERVED, \
            f"field blocks overlap at column {f}"


class ChunkedVocabBuilder:
    """Two-pass, chunk-streamed twin of build_dataset_arrays for raw files
    that don't fit host RAM as a pandas object frame (Criteo-x4 scale: a
    40M-row object DataFrame is ~100 GB; the reference pipeline,
    proc_criteo.py:55-68, loads everything).

    EXACT-equivalence contract (pinned by tests/test_preprocess.py):
    pass-1 counting accumulates per-field value counts in a Python dict —
    insertion order is the value's FIRST occurrence across the stream, which
    is precisely the first-seen order pd.factorize(sort=False) produces on
    the concatenated data — and finalize() ranks by stable descending count,
    so ids come out identical to encode_field on the full column.
    """

    def __init__(self, field_names, n_core: int):
        self.field_names = list(field_names)
        self.n_core = int(n_core)
        self._counts = {f: {} for f in self.field_names}
        self._maps = None

    def observe(self, field: str, values: np.ndarray) -> None:
        assert self._maps is None, "finalize() already called"
        c = self._counts[field]
        codes, uniques = pd.factorize(pd.Series(values), sort=False)
        cnt = np.bincount(codes[codes >= 0], minlength=len(uniques))
        for u, k in zip(uniques.tolist(), cnt.tolist()):
            if u in c:
                c[u] += k
            else:
                c[u] = k

    def finalize(self):
        """Build feat_map / field_map / per-field value->id dicts."""
        feat_map = {tok: i for i, tok in enumerate(RESERVED_TOKENS)}
        field_map = {RSV_FIELD: 0}
        self._maps = {}
        self.oov = {}
        for name in self.field_names:
            field_map[name] = len(field_map)
            items = list(self._counts[name].items())  # first-seen order
            counts = np.asarray([k for _, k in items])
            order = np.argsort(-counts, kind="stable")
            kept = order[counts[order] >= self.n_core]
            base = len(feat_map)
            m = {}
            for rank, uidx in enumerate(kept.tolist()):
                val = items[uidx][0]
                feat_map[f"{name}-{val}"] = base + rank
                m[val] = base + rank
            oov_id = base + len(kept)
            feat_map[f"{name}-<oov>"] = oov_id
            self._maps[name] = m
            self.oov[name] = oov_id
            self._counts[name] = None  # free pass-1 memory as we go
        self.feat_map, self.field_map = feat_map, field_map
        return feat_map, field_map

    def map_chunk(self, field: str, values: np.ndarray) -> np.ndarray:
        assert self._maps is not None, "call finalize() first"
        ids = pd.Series(values).map(self._maps[field])
        return ids.fillna(self.oov[field]).to_numpy(dtype=np.int32)
