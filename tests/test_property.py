"""Property-based tests (hypothesis): Gorilla codec total roundtrip over
adversarial inputs, and engine determinism invariants (same input + config =>
identical output at any partitioning)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

import ray.data as rd

from tslib_ray.kernels import gorilla
from tslib_ray.stages import rollup as R


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=200))
def test_gorilla_ts_roundtrip_any_int64(deltas):
    ts = np.cumsum(np.array([0] + deltas, dtype=np.int64))
    out = gorilla.decode_timestamps(gorilla.encode_timestamps(ts))
    assert np.array_equal(out, ts)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=200))
def test_gorilla_val_roundtrip_any_float64(vals):
    v = np.array(vals, dtype=np.float64)
    out = gorilla.decode_values(gorilla.encode_values(v))
    assert np.array_equal(out.view(np.uint64), v.view(np.uint64))


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=60),
       st.integers(min_value=2, max_value=400))
def test_gorilla_subnormal_and_patterned(seed, n):
    rng = np.random.default_rng(seed)
    v = rng.choice([0.0, -0.0, 1e-310, np.inf, 1.5, np.nan,
                    np.float64(2**52)], size=n)
    out = gorilla.decode_values(gorilla.encode_values(v))
    assert np.array_equal(out.view(np.uint64), v.view(np.uint64))
    ts = np.sort(rng.integers(0, 2**52, size=n))
    assert np.array_equal(
        gorilla.decode_timestamps(gorilla.encode_timestamps(ts)), ts)


def test_tiers_invariant_to_partition_count(sf_small):
    """The fused tier rollup must produce identical results for any n_parts
    (the partition count is an execution knob, not a semantic one)."""
    def run(n_parts):
        ds = rd.read_parquet(f"{sf_small}/events.parquet",
                             columns=["user_id", "ts", "value"])
        out = R.value_tiers_per_key(ds, "user_id", "ts", "value",
                                    n_parts=n_parts).to_pandas()
        k = ["user_id", "tier", "bucket_ts"]
        return out.sort_values(k, kind="mergesort").reset_index(drop=True)

    a, b, c = run(2), run(16), run(64)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_latency_tiers_invariant_to_partition_count(sf_small):
    def run(n_parts):
        ds = rd.read_parquet(f"{sf_small}/events.parquet",
                             columns=["event_id", "ts", "user_id"])
        out = R.latency_tiers_from_events(ds, n_parts=n_parts).to_pandas()
        k = ["conv_id", "tier", "bucket_ts"]
        return out.sort_values(k, kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(3), run(64))
