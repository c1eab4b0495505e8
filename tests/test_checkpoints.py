"""Checkpoint round-trip and shape-matched partial restore
(reference `code/trainer.py:517-527`, `code/models.py:97-112`)."""

import numpy as np

from map_tpu.train import checkpoints


def test_save_load_roundtrip(tmp_path):
    variables = {"params": {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3),
                                  "bias": np.ones(3, np.float32)}}}
    checkpoints.save_model(variables, str(tmp_path), 42)
    restored = checkpoints.load_model(str(tmp_path), 42)
    np.testing.assert_array_equal(restored["params"]["a"]["kernel"],
                                  variables["params"]["a"]["kernel"])


def test_partial_restore_name_and_shape_match(tmp_path):
    """Pretrain heads silently dropped; backbone kept (models.py:97-107)."""
    pretrain_vars = {"params": {
        "embed": {"embedding": np.full((10, 4), 7.0, np.float32)},
        "feat_encoder": {"dense": {"kernel": np.ones((4, 8), np.float32)}},
        "mfp_decoder": {"emb": np.ones((10, 2), np.float32)},
    }}
    finetune_vars = {"params": {
        "embed": {"embedding": np.zeros((10, 4), np.float32)},
        "fc_out": {"dense": {"kernel": np.zeros((4, 1), np.float32),
                             "bias": np.zeros(1, np.float32)}},
    }}
    merged, loaded, skipped = checkpoints.partial_restore(
        finetune_vars, pretrain_vars)
    assert loaded == 1   # only the embedding matches by name+shape
    assert skipped == 2
    np.testing.assert_array_equal(merged["params"]["embed"]["embedding"],
                                  np.full((10, 4), 7.0))
    # finetune-only head untouched
    assert merged["params"]["fc_out"]["dense"]["kernel"].sum() == 0


def test_partial_restore_shape_mismatch_skipped():
    a = {"params": {"x": {"kernel": np.zeros((2, 3), np.float32)}}}
    b = {"params": {"x": {"kernel": np.ones((3, 3), np.float32)}}}
    merged, loaded, skipped = checkpoints.partial_restore(a, b)
    assert loaded == 0 and skipped == 1
    assert merged["params"]["x"]["kernel"].sum() == 0
