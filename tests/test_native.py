"""Native batch-assembly kernels vs numpy oracles."""

import numpy as np

from map_tpu import native


def test_native_builds_and_loads():
    assert native.get_lib() is not None  # toolchain present in CI image


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, (5000, 24)).astype(np.int32)
    idx = rng.integers(0, 5000, 4096)
    np.testing.assert_array_equal(native.gather_rows_i32(x, idx), x[idx])


def test_gather_f32_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.random(5000).astype(np.float32)
    idx = rng.integers(0, 5000, 777)
    np.testing.assert_array_equal(native.gather_f32(x, idx), x[idx])


def test_fallback_on_noncontiguous():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 10, (100, 48)).astype(np.int32)[:, ::2]  # stride trick
    idx = rng.integers(0, 100, 32)
    np.testing.assert_array_equal(native.gather_rows_i32(x, idx), x[idx])
