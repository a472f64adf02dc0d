"""Gorilla codec roundtrip + property tests (no Ray)."""

import numpy as np
import pytest

from tslib_ray.kernels import gorilla


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 4096])
def test_ts_roundtrip_regular(n):
    ts = 1_704_067_200_000_000 + np.arange(n, dtype=np.int64) * 60_000_000
    assert np.array_equal(gorilla.decode_timestamps(
        gorilla.encode_timestamps(ts)), ts)


def test_ts_roundtrip_jittery():
    base = 1_704_067_200_000_000
    deltas = RNG.integers(-10**9, 10**9, size=5000)
    ts = base + np.cumsum(np.abs(deltas))
    out = gorilla.decode_timestamps(gorilla.encode_timestamps(ts))
    assert np.array_equal(out, ts)


def test_ts_roundtrip_extreme_dods():
    # exercise every bucket including the 64-bit fallback
    ts = np.array([0, 1, 2, 66, 70, 3000, 10**7, 10**15, 10**15 + 1],
                  dtype=np.int64)
    out = gorilla.decode_timestamps(gorilla.encode_timestamps(ts))
    assert np.array_equal(out, ts)


@pytest.mark.parametrize("vals", [
    np.array([], dtype=np.float64),
    np.array([1.5]),
    np.array([1.5, 1.5, 1.5]),
    np.array([0.0, -0.0, np.inf, -np.inf]),
    RNG.normal(size=1000),
    np.round(RNG.normal(size=1000), 2),
])
def test_val_roundtrip(vals):
    out = gorilla.decode_values(gorilla.encode_values(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_val_roundtrip_nan_bits():
    vals = np.array([np.nan, 1.0, np.nan, np.nan])
    out = gorilla.decode_values(gorilla.encode_values(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_compression_wins_on_regular_series():
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.round(100 + np.sin(np.arange(n) / 50.0), 2)
    ts_blob, val_blob = gorilla.encode_tile(ts, vals)
    raw = n * 16
    assert len(ts_blob) + len(val_blob) < raw / 2  # ~2.8x on changing data
    assert len(ts_blob) < n  # regular timestamps: ~1 bit/point
    dts, dvals = gorilla.decode_tile(ts_blob, val_blob)
    assert np.array_equal(dts, ts)
    assert np.array_equal(dvals, vals)


def test_compression_strong_on_repeating_values():
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.repeat(np.round(RNG.normal(size=n // 100), 2), 100)
    ts_blob, val_blob = gorilla.encode_tile(ts, vals)
    assert len(ts_blob) + len(val_blob) < n * 16 / 8  # >8x when values repeat
