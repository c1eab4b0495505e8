"""Criteo offline preprocessing.

Reproduces the reference pipeline (`data_preprocess/proc_criteo.py`):
- numeric fields I1-I13 discretized by floor(log(v)^2) for v > 2, NaN -> -1
  (proc_criteo.py:24-39), vectorized;
- categorical fields C1-C26 passthrough with NaN -> '-1' (proc_criteo.py:42-47);
- n-core thresholding (default 10-core), 10 reserved ids, field-blocked
  contiguous id space with per-field `<oov>`;
- emits `{name}.h5` + `{name}-meta.json`; the x4 split comes from
  `map_tpu.data.preprocess.split_x4` (written directly as `split.pkl`).

Usage: python -m map_tpu.data.preprocess.criteo --raw dac/train.txt --out data/criteo
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np
import pandas as pd

from map_tpu.data import artifacts
from map_tpu.data.preprocess import common

NUM_FIELDS = [f"I{i}" for i in range(1, 14)]
CAT_FIELDS = [f"C{i}" for i in range(1, 27)]
COLS = ["click"] + NUM_FIELDS + CAT_FIELDS


def bucket_numeric(col: pd.Series) -> np.ndarray:
    """floor(log(v)^2) for v > 2, identity for v <= 2, NaN -> -1
    (proc_criteo.py:24-39), as one vectorized pass."""
    v = pd.to_numeric(col, errors="coerce").to_numpy(dtype=np.float64)
    out = np.where(np.isnan(v), -1.0, v)
    big = out > 2
    with np.errstate(invalid="ignore"):
        out = np.where(big, np.floor(np.log(np.where(big, out, 1.0)) ** 2), out)
    return out.astype(np.int64)


def clean_categorical(col: pd.Series) -> np.ndarray:
    return col.fillna("-1").to_numpy()


def run(raw_path: str, out_dir: str, name: str = "criteo", n_core: int = 10,
        down_sample=None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_csv(raw_path, sep="\t", header=None, names=COLS,
                     dtype=object, encoding="utf-8")
    if down_sample:
        df = df.iloc[:down_sample]
    labels = pd.to_numeric(df["click"]).to_numpy().astype(np.int64)

    columns: Dict[str, np.ndarray] = {}
    for fname in NUM_FIELDS:
        columns[fname] = bucket_numeric(df[fname])
    for fname in CAT_FIELDS:
        columns[fname] = clean_categorical(df[fname])

    feat_ids, feat_map, field_map, field_names = common.build_dataset_arrays(
        columns, n_core)
    common.verify_field_blocked(feat_ids, field_map)

    artifacts.write_meta(out_dir, name, field_names, feat_map, field_map)
    artifacts.write_ctr_h5(out_dir, name, feat_ids, labels)
    print(f"criteo: {len(labels)} rows, input_size={len(feat_map)}, "
          f"num_fields={len(field_map) - 1}")


def run_chunked(raw_path: str, out_dir: str, name: str = "criteo",
                n_core: int = 10, chunk_rows: int = 2_000_000) -> None:
    """Two-pass streaming twin of run() for raw files too large for a
    resident object DataFrame (Criteo-x4 scale, ~45M rows: run()'s frame is
    ~100 GB of pandas strings). Peak host RAM ~ one chunk + the per-field
    count dicts. Output is BIT-IDENTICAL to run() (same ids, same meta —
    common.ChunkedVocabBuilder's exact-equivalence contract, pinned by
    tests/test_preprocess.py::test_chunked_criteo_matches_single_pass)."""
    import time

    os.makedirs(out_dir, exist_ok=True)
    builder = common.ChunkedVocabBuilder(NUM_FIELDS + CAT_FIELDS, n_core)

    def transformed(df, fname):
        return (bucket_numeric(df[fname]) if fname in NUM_FIELDS
                else clean_categorical(df[fname]))

    t0 = time.time()
    for i, df in enumerate(pd.read_csv(raw_path, sep="\t", header=None,
                                       names=COLS, dtype=object,
                                       encoding="utf-8",
                                       chunksize=chunk_rows)):
        for fname in NUM_FIELDS + CAT_FIELDS:
            builder.observe(fname, transformed(df, fname))
        print(f"  pass1 chunk {i}: +{len(df)} rows "
              f"({time.time() - t0:.0f}s)", flush=True)
    builder.finalize()
    print(f"  vocab built: input_size={len(builder.feat_map)} "
          f"({time.time() - t0:.0f}s)", flush=True)

    writer = artifacts.H5Writer(out_dir, name, len(NUM_FIELDS + CAT_FIELDS))
    lo = hi = None
    for i, df in enumerate(pd.read_csv(raw_path, sep="\t", header=None,
                                       names=COLS, dtype=object,
                                       encoding="utf-8",
                                       chunksize=chunk_rows)):
        labels = pd.to_numeric(df["click"]).to_numpy().astype(np.int64)
        ids = np.stack([builder.map_chunk(f, transformed(df, f))
                        for f in NUM_FIELDS + CAT_FIELDS], axis=1)
        clo, chi = ids.min(axis=0), ids.max(axis=0)
        lo = clo if lo is None else np.minimum(lo, clo)
        hi = chi if hi is None else np.maximum(hi, chi)
        writer.append(ids, labels)
        print(f"  pass2 chunk {i}: +{len(df)} rows "
              f"({time.time() - t0:.0f}s)", flush=True)
    n = writer.close()
    # chunked twin of common.verify_field_blocked
    for f in range(len(lo) - 1):
        assert hi[f] < lo[f + 1] or hi[f] < artifacts.NUM_RESERVED, \
            f"field blocks overlap at column {f}"
    artifacts.write_meta(out_dir, name, NUM_FIELDS + CAT_FIELDS,
                         builder.feat_map, builder.field_map)
    print(f"criteo (chunked): {n} rows, input_size={len(builder.feat_map)}, "
          f"num_fields={len(builder.field_map) - 1}, "
          f"wall={time.time() - t0:.0f}s")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--name", default="criteo")
    p.add_argument("--n_core", type=int, default=10)
    p.add_argument("--down_sample", type=int, default=None)
    p.add_argument("--chunked", action="store_true",
                   help="two-pass streaming mode for >RAM raw files")
    p.add_argument("--chunk_rows", type=int, default=2_000_000)
    a = p.parse_args()
    if a.chunked:
        assert a.down_sample is None, "down_sample implies the in-RAM path"
        run_chunked(a.raw, a.out, a.name, a.n_core, a.chunk_rows)
    else:
        run(a.raw, a.out, a.name, a.n_core, a.down_sample)


if __name__ == "__main__":
    main()
