"""Round-4b additions: Bloom-prefiltered exact anti-join, ratio/moment
aggregates, per-key mode, LAG first-difference, and the one-shuffle
grouping-sets rework (partition-count invariance)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"
_TABLES = ("customer", "orders", "lineitem", "events")


def _con():
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# bloom_anti_join stage
# ---------------------------------------------------------------------------

def test_bloom_anti_join_brute_force_with_forced_false_positives():
    """m_bits=64 on 40 build keys saturates the bitmap, so most left rows
    HIT the filter and must be rescued by the exact verify pass — the
    false-positive path is the one under test. Payloads above 2^53 guard
    the Arrow-native (no pandas float64 promotion) contract."""
    from tslib_ray.stages.join import bloom_anti_join
    rng = np.random.default_rng(13)
    lk = rng.choice(10_000, 300, replace=False).astype(np.int64)
    rk = rng.choice(10_000, 40, replace=False).astype(np.int64)
    payload = (2 ** 60 + np.arange(300)).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(lk),
                                   "pid": pa.array(payload)}))
    right = rd.from_arrow(pa.table({"rk": pa.array(rk)}))
    out = bloom_anti_join(left, "k", right, "rk",
                          m_bits=64, n_parts=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    keep = ~np.isin(lk, rk)
    want = pd.DataFrame({"k": lk[keep], "pid": payload[keep]}) \
        .sort_values("k").reset_index(drop=True)
    assert out["pid"].dtype == np.int64
    pd.testing.assert_frame_equal(out, want)


def test_bloom_anti_join_empty_build_side_keeps_everything():
    from tslib_ray.stages.join import bloom_anti_join
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3],
                                                 type=pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], type=pa.int64())}))
    out = bloom_anti_join(left, "k", right, "rk",
                          m_bits=1 << 10, n_parts=2).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]


def test_bloom_anti_join_all_members_yields_empty():
    from tslib_ray.stages.join import bloom_anti_join
    left = rd.from_arrow(pa.table({"k": pa.array([5, 6], type=pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([5, 6, 7],
                                                   type=pa.int64())}))
    out = bloom_anti_join(left, "k", right, "rk",
                          m_bits=1 << 10, n_parts=2)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# query <-> oracle parity at sf0.001 (the driver's compare, in-process)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["antijoin_no_orders", "weighted_avg_disc",
                                  "corr_qty_price", "mode_event_type",
                                  "lag_diff", "grouping_sets"])
def test_query_matches_oracle(name):
    from tslib_ray.pipelines.queries import QUERIES
    fn, sql = QUERIES[name]
    got = _canon(fn(SF).to_pandas())
    con = _con()  # keep the connection alive past .sql().df()
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.floating) \
                or np.issubdtype(b.dtype, np.floating):
            assert np.allclose(a.to_numpy(np.float64),
                               b.to_numpy(np.float64),
                               rtol=0, atol=1e-9, equal_nan=True), c
        else:
            assert a.tolist() == b.tolist(), c


# ---------------------------------------------------------------------------
# grouping sets: partition-count invariance (the _auto_parts contract)
# ---------------------------------------------------------------------------

def test_grouping_sets_partition_count_invariant(monkeypatch):
    """_auto_parts is a pure scheduling knob: the canonical in-partition
    sort must make the RESULT identical under any partition count."""
    import tslib_ray.pipelines.queries as Q
    base = _canon(Q.QUERIES["grouping_sets"][0](SF).to_pandas())
    for parts in (1, 3, 17):
        monkeypatch.setattr(Q, "_auto_parts",
                            lambda *a, _p=parts, **k: _p)
        got = _canon(Q.QUERIES["grouping_sets"][0](SF).to_pandas())
        pd.testing.assert_frame_equal(got, base)
