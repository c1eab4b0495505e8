""">RAM dataset loading (VERDICT round-4 item 4): a tiny host budget must
force the memmap path, and its stream must be BIT-IDENTICAL to the in-RAM
path — same Batcher batches, same stats, same field ranges."""

import dataclasses
import os

import numpy as np
import pytest

from map_tpu.config import TrainingArguments
from map_tpu.data.dataset import CTRDataset
from map_tpu.data.loader import Batcher


def _args(data_dir, budget_mb):
    return TrainingArguments(
        output_dir=os.path.join(data_dir, "out"), data_dir=data_dir,
        dataset_name="synth", per_device_train_batch_size=64,
        learning_rate=1e-3, host_data_budget_mb=budget_mb, pretrain=True,
        pt_type="MFP")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from map_tpu.data import synth

    d = str(tmp_path_factory.mktemp("mmapdata"))
    # 60k rows x 7 cols x 4 B x 2 ~ 3.4 MB: above the 1 MB test budget
    synth.generate(d, name="synth", num_rows=60000, num_fields=6,
                   vocab_per_field=40, seed=11)
    return d


def test_budget_forces_memmap_and_streams_match(data_dir):
    ram = CTRDataset(_args(data_dir, -1))
    assert not ram.memory_mapped
    lazy = CTRDataset(_args(data_dir, 1))  # 1 MB: anything real exceeds it
    assert lazy.memory_mapped
    assert isinstance(lazy.X["train"], np.memmap)

    # stats + invariants identical
    np.testing.assert_array_equal(lazy.idx_low, ram.idx_low)
    np.testing.assert_array_equal(lazy.idx_high, ram.idx_high)
    np.testing.assert_array_equal(lazy.feat_count, ram.feat_count)
    assert lazy.field_blocked_ok == ram.field_blocked_ok

    # split arrays bit-identical
    for s in ("train", "valid", "test"):
        np.testing.assert_array_equal(np.asarray(lazy.X[s]), ram.X[s])
        np.testing.assert_array_equal(np.asarray(lazy.Y[s]), ram.Y[s])

    # the shuffled, noise-carrying Batcher stream is bit-identical
    ba = Batcher(ram.X["train"], ram.Y["train"], 64, shuffle=True, seed=7,
                 noise_source=ram.X["train"], noise_rows_per_example=2)
    bb = Batcher(lazy.X["train"], lazy.Y["train"], 64, shuffle=True, seed=7,
                 noise_source=lazy.X["train"], noise_rows_per_example=2)
    for ga, gb, _ in zip(ba.epoch(0), bb.epoch(0), range(5)):
        assert set(ga.keys()) == set(gb.keys())
        for k in ga:
            np.testing.assert_array_equal(np.asarray(ga[k]),
                                          np.asarray(gb[k]), err_msg=k)


def test_memmap_files_are_reused(data_dir):
    _ = CTRDataset(_args(data_dir, 1))
    done = os.path.join(data_dir, "synth-mmap.done")
    assert os.path.exists(done)
    stamp = os.path.getmtime(
        os.path.join(data_dir, "synth-train-X.i32.mmap"))
    again = CTRDataset(_args(data_dir, 1))  # must NOT re-materialize
    assert os.path.getmtime(
        os.path.join(data_dir, "synth-train-X.i32.mmap")) == stamp
    assert again.memory_mapped


def test_auto_budget_keeps_small_data_in_ram(data_dir):
    ds = CTRDataset(_args(data_dir, 0))  # auto: 3000 rows << 60% RAM
    assert not ds.memory_mapped


def test_budget_model_uses_stored_itemsize(data_dir):
    """The peak model is (max(stored_itemsize, 4) + 4) B/elem: an int64 h5
    (the preprocessing writers' numpy default) peaks at 12 B/elem while it
    coexists with the int32 working copy — the old 2x-int32 model (8 B/elem)
    under-counted it by 50% (the Criteo-x4 proof's surprise RSS)."""
    from map_tpu.data import artifacts

    rows, nf, itemsize = artifacts.h5_matrix_info(data_dir, "synth")
    assert (rows, nf) == artifacts.h5_dims(data_dir, "synth")
    per_elem = max(itemsize, 4) + 4
    need_mb = rows * nf * per_elem / (1 << 20)
    # a budget just under the modeled peak flips to memmap...
    assert CTRDataset(_args(data_dir, int(need_mb) )).memory_mapped
    # ...and a budget just over it stays in RAM
    assert not CTRDataset(_args(data_dir, int(need_mb) + 1)).memory_mapped
