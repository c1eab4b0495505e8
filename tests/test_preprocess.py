"""Preprocessing pipelines: id-space invariants and transform semantics
(reference `data_preprocess/`, SURVEY.md §2.5)."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from map_tpu.data import artifacts
from map_tpu.data.dataset import CTRDataset
from map_tpu.data.preprocess import common
from map_tpu.data.preprocess.avazu import expand_hour, run as run_avazu
from map_tpu.data.preprocess.criteo import bucket_numeric, run as run_criteo
from map_tpu.data.preprocess.split_x4 import make_split


def test_reserved_ids():
    assert artifacts.RESERVED_TOKENS[3] == "<mask>"
    assert artifacts.MASK_ID == 3
    assert artifacts.NUM_RESERVED == 10


def test_encode_field_blocked_contiguous():
    rng = np.random.default_rng(0)
    cols = {
        "a": rng.choice(["x", "y", "z", "rare1", "rare2"], 100,
                        p=[0.4, 0.3, 0.26, 0.02, 0.02]),
        "b": rng.integers(0, 5, 100),
    }
    feat_ids, feat_map, field_map, names = common.build_dataset_arrays(cols, n_core=5)
    assert names == ["a", "b"]
    assert field_map == {"<rsv>": 0, "a": 1, "b": 2}
    # field a block: ids 10..13 (x,y,z + oov); field b follows contiguously
    a_ids = feat_ids[:, 0]
    b_ids = feat_ids[:, 1]
    assert a_ids.min() >= 10
    assert b_ids.min() > a_ids.max()
    common.verify_field_blocked(feat_ids, field_map)
    # most frequent value gets the lowest id in the block
    assert feat_map["a-x"] == 10
    # rare values map to the field <oov>
    oov = feat_map["a-<oov>"]
    rare_rows = np.isin(cols["a"], ["rare1", "rare2"])
    assert (a_ids[rare_rows] == oov).all()


def test_bucket_numeric_log_squared():
    s = pd.Series(["1", "2", "3", "100", None, "0"])
    out = bucket_numeric(s)
    # v<=2 identity; v>2 floor(log(v)^2); NaN -> -1 (proc_criteo.py:24-39)
    assert out[0] == 1 and out[1] == 2
    assert out[2] == int(np.floor(np.log(3.0) ** 2))
    assert out[3] == int(np.floor(np.log(100.0) ** 2))
    assert out[4] == -1
    assert out[5] == 0


def test_expand_hour():
    # 2014-10-21 is a Tuesday; 14102204 = Wed 4am; weekend check
    raw = np.array([14102113, 14102204, 14102523])  # Sat 25th
    cols = expand_hour(raw)
    assert list(cols["weekday"]) == [1, 2, 5]
    assert list(cols["day"]) == [21, 22, 25]
    assert list(cols["hour"]) == [13, 4, 23]
    assert list(cols["is_weekend"]) == [0, 0, 1]


def test_stratified_split_shapes():
    rng = np.random.default_rng(0)
    labels = (rng.random(1000) < 0.3).astype(np.int64)
    splits = make_split(labels)
    n = sum(len(v) for v in splits.values())
    assert n == 1000
    # legacy (sklearn 0.19.1) fold sizing spreads each class's remainder over
    # that class's FIRST folds, so fold sizes vary by up to the class count
    assert abs(len(splits["train"]) - 800) <= 10
    # stratification: positive ratio within 3% across splits
    ratios = [labels[v].mean() for v in splits.values()]
    assert max(ratios) - min(ratios) < 0.03
    # disjoint
    all_idx = np.concatenate(list(splits.values()))
    assert len(np.unique(all_idx)) == 1000


def test_avazu_pipeline_end_to_end(tmp_path):
    """gz csv -> artifacts -> CTRDataset round trip."""
    rng = np.random.default_rng(0)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n),
        "click": rng.integers(0, 2, n),
        "hour": rng.choice([14102113, 14102204, 14102523], n),
        **{c: rng.choice(["a", "b", "c", "d"], n) for c in
           ["C1", "banner_pos", "site_id", "site_domain", "site_category",
            "app_id", "app_domain", "app_category", "device_id", "device_ip",
            "device_model", "device_type", "device_conn_type", "C14", "C15",
            "C16", "C17", "C18", "C19", "C20", "C21"]},
    })
    raw = tmp_path / "train.gz"
    with gzip.open(raw, "wt") as f:
        df.to_csv(f, index=False)
    out = tmp_path / "data"
    run_avazu(str(raw), str(out), name="avazu", n_core=2)

    class Args:
        data_dir = str(out)
        dataset_name = "avazu"
        pretrain = False
        pt_type = "MFP"
        RFD_replace = "Unigram"

    ds = CTRDataset(Args())
    assert ds.num_fields == 25  # 4 time fields + 21 raw
    assert ds.X["train"].shape[1] == 25
    total = sum(len(ds.Y[s]) for s in ds.split_names)
    assert total == n


def test_criteo_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    n = 300
    cols = {"click": rng.integers(0, 2, n).astype(str)}
    for i in range(1, 14):
        v = rng.integers(-1, 50, n).astype(object)
        v[rng.random(n) < 0.1] = None
        cols[f"I{i}"] = v
    for i in range(1, 27):
        cols[f"C{i}"] = rng.choice(["aa", "bb", "cc"], n)
    raw = tmp_path / "train.txt"
    pd.DataFrame(cols).to_csv(raw, sep="\t", header=False, index=False)
    out = tmp_path / "data"
    run_criteo(str(raw), str(out), name="criteo", n_core=2)

    from map_tpu.data.preprocess.split_x4 import run as run_split
    run_split(str(out / "criteo.h5"), str(out))

    class Args:
        data_dir = str(out)
        dataset_name = "criteo"
        pretrain = True
        pt_type = "RFD"
        RFD_replace = "Uniform"

    ds = CTRDataset(Args())
    assert ds.num_fields == 39
    assert ds.idx_low is not None  # per-field ranges computed for RFD-Uniform
    assert ds.feat_count is not None


def test_legacy_kfold_core_matches_modern_sklearn():
    """The vendored 0.19.1 StratifiedKFold is built from per-class KFold
    shuffles consuming ONE shared RandomState in class order. KFold's
    shuffle+contiguous-slice shape is unchanged between 0.19.1 and modern
    sklearn, so each class's fold assignment must match modern KFold run on
    the class subset with the same shared stream."""
    from sklearn.model_selection import KFold

    from map_tpu.data.preprocess.split_x4 import stratified_kfold_legacy

    rng = np.random.default_rng(5)
    y = (rng.random(997) < 0.27).astype(np.int64)
    test_folds = stratified_kfold_legacy(y, n_splits=10, seed=2018)

    shared = np.random.RandomState(2018)
    for cls in (0, 1):
        cls_pos = np.flatnonzero(y == cls)
        kf = KFold(n_splits=10, shuffle=True, random_state=shared)
        for fold_idx, (_, test_split) in enumerate(
                kf.split(np.zeros(len(cls_pos)))):
            want = np.zeros(len(cls_pos), dtype=bool)
            want[test_split] = True
            got = test_folds[cls_pos] == fold_idx
            np.testing.assert_array_equal(got, want)


def test_legacy_split_deterministic_pin():
    """Pin a digest of the legacy fold assignment so any change to the
    vendored algorithm (or a numpy RandomState regression) is caught."""
    import hashlib

    from map_tpu.data.preprocess.split_x4 import stratified_kfold_legacy

    rng = np.random.default_rng(11)
    y = (rng.random(5000) < 0.2).astype(np.int64)
    tf = stratified_kfold_legacy(y, n_splits=10, seed=2018)
    digest = hashlib.md5(tf.astype(np.int64).tobytes()).hexdigest()
    assert digest == stratified_kfold_legacy.__test_pin__, digest


def test_chunked_criteo_matches_single_pass(tmp_path):
    """run_chunked (two-pass streaming, >RAM mode) must produce BIT-IDENTICAL
    artifacts to run() — ids, labels, meta — including tie cases (equal
    counts resolve by first occurrence, Counter.most_common order)."""
    import json

    import h5py
    import numpy as np

    from map_tpu.data.preprocess import criteo

    rng = np.random.default_rng(5)
    n = 5000
    cols = []
    labels = rng.integers(0, 2, n)
    cols.append(labels.astype(str))
    for i in range(13):  # I1-13 numeric with NaN holes
        v = rng.integers(-2, 4000, n).astype(object)
        v[rng.random(n) < 0.2] = ""
        cols.append(np.asarray(v, dtype=object))
    for i in range(26):  # C1-26 categorical, Zipf-ish, with empties
        k = int(rng.integers(5, 400))
        v = np.minimum((rng.pareto(1.0, n) * 3).astype(np.int64), k)
        s = np.asarray([f"v{x:x}" for x in v], dtype=object)
        s[rng.random(n) < 0.1] = ""
        cols.append(s)
    raw = tmp_path / "dac.txt"
    with open(raw, "w") as f:
        for r in range(n):
            f.write("\t".join(str(c[r]) for c in cols) + "\n")

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    criteo.run(str(raw), out_a, name="criteo")
    criteo.run_chunked(str(raw), out_b, name="criteo", chunk_rows=700)

    for fn in ("criteo-meta.json",):
        with open(f"{out_a}/{fn}") as fa, open(f"{out_b}/{fn}") as fb:
            assert json.load(fa) == json.load(fb)
    with h5py.File(f"{out_a}/criteo.h5") as fa, \
            h5py.File(f"{out_b}/criteo.h5") as fb:
        np.testing.assert_array_equal(fa["feat_ids"][:], fb["feat_ids"][:])
        np.testing.assert_array_equal(fa["labels"][:], fb["labels"][:])
