"""Native threaded row-gather (native/rowgather.cpp) via
clsurvey_tpu/utils/rowgather.py — the streaming path's host collate."""

import numpy as np
import pytest

from clsurvey_tpu.utils import rowgather


pytestmark = pytest.mark.smoke


def test_native_available_and_matches_numpy():
    assert rowgather.available(), "native rowgather failed to build"
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (137, 9, 5, 3), dtype=np.uint8)
    idx = rng.integers(0, 137, 401)
    out = rowgather.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    assert out.flags["C_CONTIGUOUS"]


def test_thread_counts_agree():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (64, 33), dtype=np.uint8)
    idx = rng.integers(0, 64, 129)
    ref = src[idx]
    for t in (1, 2, 7, 1000):
        np.testing.assert_array_equal(
            rowgather.gather_rows(src, idx, n_threads=t), ref)


def test_out_of_range_raises():
    src = np.zeros((4, 3), np.uint8)
    if not rowgather.available():
        pytest.skip("native lib unavailable")
    with pytest.raises(IndexError):
        rowgather.gather_rows(src, np.array([0, 4]))
    with pytest.raises(IndexError):
        rowgather.gather_rows(src, np.array([-1]))


def test_fallback_non_uint8_and_empty():
    src = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([2, 0])
    np.testing.assert_array_equal(rowgather.gather_rows(src, idx), src[idx])
    out = rowgather.gather_rows(np.zeros((4, 3), np.uint8),
                                np.zeros(0, np.int64))
    assert out.shape == (0, 3)


def test_multidim_idx_matches_fancy_indexing():
    """2-D idx must follow numpy semantics on BOTH paths (the native
    path declines it), not silently flatten."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (16, 5), dtype=np.uint8)
    idx = rng.integers(0, 16, (4, 6))
    out = rowgather.gather_rows(src, idx)
    assert out.shape == (4, 6, 5)
    np.testing.assert_array_equal(out, src[idx])
