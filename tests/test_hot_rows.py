"""Trainer._build_hot_rows: the static hot physical-row lists that drive the
hotcold exchange must cover every field's frequency-descending prefix plus
the reserved block, per table geometry (packed widths share lists by
physical row count)."""

import numpy as np

from map_tpu import models
from map_tpu.config import build_config, parse_args
from map_tpu.data.dataset import CTRDataset
from map_tpu.ops.packed_table import pack_factor, packed_shape
from map_tpu.train.trainer import Trainer


def test_build_hot_rows_covers_prefixes(tmp_path, synth_dir):
    model_args, training_args = parse_args([
        "--model_name", "dcnv2", "--output_dir", str(tmp_path),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--hot_rows_per_field", "4"])
    ds = CTRDataset(training_args)
    config = build_config(model_args, training_args, ds)
    model = models.from_config(config)
    tr = Trainer(model, config, training_args, ds)

    hot = tr._build_hot_rows()
    v = int(config.input_size)
    # one list per distinct table geometry: embed (8-wide) and 1-wide tables
    for e in (8, 1):
        p = pack_factor(e)
        nrows = packed_shape(v, e)[0]
        rows = hot[nrows]
        assert rows.dtype == np.int32
        assert np.all(np.diff(rows) > 0)  # unique ascending (searchsorted)
        got = set(rows.tolist())
        # reserved block (<mask>=3 lives there) always hot
        assert 0 in got
        for lo, hi in zip(config.idx_low, config.idx_high):
            stop = min(int(lo) + 4, int(hi))
            for logical in range(int(lo), stop):
                assert logical // p in got, (e, logical)


def test_build_hot_rows_without_ranges_is_empty(tmp_path, synth_dir):
    model_args, training_args = parse_args([
        "--model_name", "dcnv2", "--output_dir", str(tmp_path),
        "--dataset_name", "synth", "--data_dir", synth_dir])
    ds = CTRDataset(training_args)
    config = build_config(model_args, training_args, ds)
    config.idx_low = None
    model = models.from_config(config)
    tr = Trainer(model, config, training_args, ds)
    assert tr._build_hot_rows() == {}
