"""Avazu offline preprocessing.

Reproduces the reference pipeline (`data_preprocess/proc_avazu.py`):
- fields: C1, banner_pos, site/app/device fields, C14-C21, plus the `hour`
  column expanded to weekday / day / hour / is_weekend (proc_avazu.py:44-60);
- rows shuffled with seed 42 (proc_avazu.py:197-203);
- n-core vocabulary thresholding (default 5-core) with per-field `<oov>` and
  the 10 reserved ids (see common.py);
- emits the canonical artifacts the framework loads (`{name}.h5` feat_ids +
  labels, `{name}-meta.json`, `split.pkl`) directly — no manual rename step
  (the reference's split_x4.pkl vs split.pkl mismatch, SURVEY.md §5 defects).

The hour expansion and all id assignment are vectorized pandas/numpy
column passes instead of per-row Python loops.

Usage: python -m map_tpu.data.preprocess.avazu --raw train.gz --out data/avazu
       [--n_core 5] [--split 8:1:1 | --split_pkl path]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

from map_tpu.data import artifacts
from map_tpu.data.preprocess import common

RAW_FIELDS = ["click", "hour", "C1", "banner_pos", "site_id", "site_domain",
              "site_category", "app_id", "app_domain", "app_category",
              "device_id", "device_ip", "device_model", "device_type",
              "device_conn_type", "C14", "C15", "C16", "C17", "C18", "C19",
              "C20", "C21"]
# order parity with proc_avazu.py:20-22
VALID_FIELDS = ["weekday", "day", "hour", "is_weekend", "C1", "banner_pos",
                "site_id", "site_domain", "site_category", "app_id",
                "app_domain", "app_category", "device_id", "device_ip",
                "device_model", "device_type", "device_conn_type", "C14",
                "C15", "C16", "C17", "C18", "C19", "C20", "C21"]


def expand_hour(hour_raw: np.ndarray) -> Dict[str, np.ndarray]:
    """YYMMDDHH ints -> weekday / day / hour / is_weekend (proc_avazu.py:45-54)."""
    ts = pd.to_datetime(pd.Series(hour_raw).astype(str), format="%y%m%d%H")
    weekday = ts.dt.weekday.to_numpy()
    return {
        "weekday": weekday,
        "day": ts.dt.day.to_numpy(),
        "hour": ts.dt.hour.to_numpy(),
        "is_weekend": (weekday > 4).astype(np.int64),
    }


def run(raw_path: str, out_dir: str, name: str = "avazu", n_core: int = 5,
        split: str = "8:1:1", split_pkl: Optional[str] = None,
        down_sample: Optional[int] = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    compression = "gzip" if raw_path.endswith(".gz") else None
    df = pd.read_csv(raw_path, compression=compression,
                     usecols=[c for c in RAW_FIELDS])

    np.random.seed(42)  # proc_avazu.py:197
    index = np.arange(len(df))
    np.random.shuffle(index)
    if down_sample:
        index = index[:down_sample]
    df = df.iloc[index].reset_index(drop=True)

    labels = df["click"].to_numpy().astype(np.int64)
    time_cols = expand_hour(df["hour"].to_numpy())

    columns: Dict[str, np.ndarray] = {}
    for fname in VALID_FIELDS:
        columns[fname] = time_cols[fname] if fname in time_cols \
            else df[fname].to_numpy()

    feat_ids, feat_map, field_map, field_names = common.build_dataset_arrays(
        columns, n_core)
    common.verify_field_blocked(feat_ids, field_map)

    artifacts.write_meta(out_dir, name, field_names, feat_map, field_map)
    artifacts.write_ctr_h5(out_dir, name, feat_ids, labels)

    if split_pkl:
        import pickle
        with open(split_pkl, "rb") as f:
            payload = pickle.load(f)
        splits = {s: np.asarray(payload[f"{s}_index"])
                  for s in ("train", "valid", "test")}
    else:
        fr = [float(x) for x in split.split(":")]
        fr = [x / sum(fr) for x in fr]
        n = len(labels)
        # rows were already shuffled; contiguous split is random
        n_train, n_valid = int(fr[0] * n), int(fr[1] * n)
        splits = {
            "train": np.arange(0, n_train),
            "valid": np.arange(n_train, n_train + n_valid),
            "test": np.arange(n_train + n_valid, n),
        }
    artifacts.write_split(out_dir, splits)
    print(f"avazu: {len(labels)} rows, input_size={len(feat_map)}, "
          f"num_fields={len(field_map) - 1}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--name", default="avazu")
    p.add_argument("--n_core", type=int, default=5)
    p.add_argument("--split", default="8:1:1")
    p.add_argument("--split_pkl", default=None)
    p.add_argument("--down_sample", type=int, default=None)
    a = p.parse_args()
    run(a.raw, a.out, a.name, a.n_core, a.split, a.split_pkl, a.down_sample)


if __name__ == "__main__":
    main()
