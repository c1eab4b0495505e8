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
