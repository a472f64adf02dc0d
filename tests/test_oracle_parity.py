"""Driver-style correctness gate, run locally: every SQL-checked query in
``__ray_entry__`` is executed via Ray AND via DuckDB on the same parquet
tables; row counts, schemas (column names) and values must match after
column-name sort + row sort — the same comparison the driver applies."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrypoint

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


SQL_QUERIES = sorted(entrypoint.oracle_sql().keys())

# queries whose oracle is a VALUES literal built from the driver's sf0.01
# fixtures — must be evaluated at that scale locally too
_SF_MID_QUERIES = {"gap_fill_svd", "forecast_per_user", "incremental_denoise",
                   "lttb_downsample", "tdigest_quantile_1d",
                   "tdigest_cascade_1h", "bpe_token_count"}


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, sf_small, sf_mid):
    # _w2 window-hedge aliases share the base query's oracle scale
    sf = sf_mid if name.removesuffix("_w2") in _SF_MID_QUERIES else sf_small
    ray_fn = entrypoint.queries()[name]
    sql = entrypoint.oracle_sql()[name]
    got = _canon(_to_pandas(ray_fn(sf)))
    con = _duck(sf)
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(
                want[c].dtype, np.floating):
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=np.float64),
                want[c].to_numpy(dtype=np.float64),
                rtol=0, atol=1e-9, equal_nan=True, err_msg=f"{name}.{c}")
        else:
            assert got[c].tolist() == want[c].tolist(), f"{name}.{c}"


def test_entry_smoke():
    res = entrypoint.entry()
    df = _to_pandas(res)
    assert len(df) >= 0 and len(df.columns) > 0
