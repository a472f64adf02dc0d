"""Round-3 batch-3 stage tests: interval join, sliding distinct,
repetition score, TF-IDF top-k, trend slope / anomaly queries."""

import numpy as np
import pandas as pd

import ray.data as rd

from tslib_ray.stages.distinct import sliding_distinct
from tslib_ray.stages.interval import interval_count_join
from tslib_ray.stages.text import repetition_score, tfidf_topk


def test_interval_count_join_matches_bruteforce():
    rng = np.random.default_rng(7)
    n_pts, n_rng = 2000, 120
    pts = np.sort(rng.integers(0, 10**9, n_pts))  # ~1000 s span in us
    lo = rng.integers(0, 10**9, n_rng)
    span = rng.integers(0, 50_000_000, n_rng)  # <= bucket width
    hi = lo + span
    points = rd.from_pandas(pd.DataFrame({"ts": pts})).repartition(5)
    ranges = rd.from_pandas(pd.DataFrame(
        {"rid": np.arange(n_rng, dtype=np.int64), "lo": lo, "hi": hi}))
    got = interval_count_join(points, ranges, "ts", "rid", "lo", "hi",
                              bucket_us=50_000_000, n_parts=7).to_pandas()
    got = got.set_index("rid")["n"]
    for r in range(n_rng):
        want = int(((pts >= lo[r]) & (pts < hi[r])).sum())
        assert got.get(r, 0) == want, r


def test_interval_count_join_degenerate_and_aligned_ranges():
    pts = np.array([0, 10, 20, 50_000_000, 99_999_999], dtype=np.int64)
    ranges = pd.DataFrame({
        "rid": np.array([0, 1, 2], dtype=np.int64),
        # empty (hi == lo), bucket-aligned exact, cross-boundary
        "lo": np.array([10, 0, 25_000_000], dtype=np.int64),
        "hi": np.array([10, 50_000_000, 75_000_000], dtype=np.int64)})
    got = interval_count_join(
        rd.from_pandas(pd.DataFrame({"ts": pts})),
        rd.from_pandas(ranges), "ts", "rid", "lo", "hi",
        bucket_us=50_000_000).to_pandas().set_index("rid")["n"]
    assert got.get(0, 0) == 0
    assert got[1] == 3  # 0, 10, 20 (50M excluded: half-open)
    assert got[2] == 1  # 50M only


def test_sliding_distinct_matches_pandas():
    rng = np.random.default_rng(3)
    n = 5000
    ts = rng.integers(0, 4 * 3_600_000_000, n)  # 4 h of traffic
    users = rng.integers(0, 40, n)
    ds = rd.from_pandas(pd.DataFrame(
        {"ts": pd.to_datetime(ts, unit="us"),
         "user_id": users})).repartition(6)
    got = sliding_distinct(ds, "ts", "user_id",
                           window_us=3_600_000_000,
                           slide_us=900_000_000).to_pandas()
    got["window_start"] = got["window_start"].astype("datetime64[us]")
    got = got.set_index("window_start")["n_distinct"]
    starts = np.unique((ts // 900_000_000)[:, None]
                       - np.arange(4)[None, :]) * 900_000_000
    for s in starts:
        inside = (ts >= s) & (ts < s + 3_600_000_000)
        want = len(np.unique(users[inside]))
        if want:
            assert got[pd.Timestamp(s, unit="us")] == want


def test_repetition_score_known_docs():
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c a b c a b c",   # repeated trigrams
                 "one two three four",  # all distinct
                 "x y",                 # shorter than k -> whole-doc rule
                 "w w w w w"],          # single repeated trigram
    }))
    out = repetition_score(docs, k=3).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_shingles"] == 7
    assert out.loc[0, "n_distinct"] == 3
    assert abs(out.loc[0, "dup_ratio"] - (1 - 3 / 7)) < 1e-6
    assert out.loc[1, "dup_ratio"] == 0.0
    assert out.loc[2, "n_shingles"] == 1 and out.loc[2, "n_distinct"] == 1
    assert out.loc[3, "n_shingles"] == 3 and out.loc[3, "n_distinct"] == 1


def test_tfidf_topk_ranking_and_scores():
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["apple apple banana common",
                 "banana banana common",
                 "cherry common common"],
    }))
    out = tfidf_topk(docs, k=2).to_pandas()
    top1 = out[out["rank"] == 1].set_index("doc_id")
    # doc 1: apple tf=2 df=1; doc 2: banana tf=2 df=2; doc 3: common tf=2 df=3
    assert top1.loc[1, "term"] == "apple"
    assert top1.loc[2, "term"] == "banana"
    assert top1.loc[3, "term"] == "common"
    want = 2 * np.log(3 / 1)
    got = float(top1.loc[1, "tfidf"])
    assert abs(got - want) < 1e-5
    # rank 2 of doc 1: banana (tf=1) beats common (tf=1) on df 2 < 3
    r2 = out[(out["doc_id"] == 1) & (out["rank"] == 2)].iloc[0]
    assert r2["term"] == "banana"


def test_trend_slope_recovers_planted_line(sf_small):
    # on a synthetic frame with an exact line, slope/intercept are exact
    from tslib_ray.pipelines.queries import QUERIES
    import duckdb
    got = QUERIES["trend_slope"][0](sf_small)
    got = got.to_pandas().sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_small}/events.parquet')")
    want = con.sql(QUERIES["trend_slope"][1]).df() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, atol=1e-9, rtol=0)


def test_anomaly_zscore_flags_planted_outlier():
    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.repeat(np.arange(4, dtype=np.int64), n // 4),
        "value": rng.standard_normal(n) * 0.1 + 5.0,
    })
    df.loc[10, "value"] = 50.0  # unmistakable outlier for user 0
    import ray
    from tslib_ray.pipelines import queries as Q
    ds = rd.from_pandas(df).repartition(4)

    # reuse the query body via a local re-bind of _events
    import tslib_ray.pipelines.queries as qq
    orig = qq._events
    try:
        qq._events = lambda sf, columns=None: ds.select_columns(columns)
        out = qq.q_anomaly_zscore("ignored").to_pandas()
    finally:
        qq._events = orig
    assert 10 in set(out["event_id"])
    assert (out["z"].abs() > 3).all()


import pytest


def _cc_impl(name):
    from tslib_ray.stages import graph
    if name == "dataset":
        # small_graph_rows=0 forces the distributed rounds (round 4 added a
        # single-task fast path below that threshold — tested separately)
        return lambda e, n: graph.connected_components(
            e, n, n_parts=4, small_graph_rows=0)
    return lambda e, n: graph.connected_components_actors(e, n, n_shards=3)


@pytest.mark.parametrize("impl", ["dataset", "actors"])
def test_connected_components_chain_and_islands(impl):
    edges = pd.DataFrame({"src": np.array([1, 2, 5], dtype=np.int64),
                          "dst": np.array([2, 3, 6], dtype=np.int64)})
    nodes = pd.DataFrame({"node": np.arange(8, dtype=np.int64)})
    out = _cc_impl(impl)(rd.from_pandas(edges).repartition(2),
                         rd.from_pandas(nodes).repartition(3)).to_pandas()
    lab = out.set_index("node")["label"]
    # chain 1-2-3 collapses transitively; 5-6 pairs; the rest are singletons
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[5] == lab[6] == 5
    for iso in (0, 4, 7):
        assert lab[iso] == iso
    assert len(out) == 8


@pytest.mark.parametrize("impl", ["dataset", "actors"])
def test_connected_components_random_vs_networkx_free_bruteforce(impl):
    rng = np.random.default_rng(13)
    n, m = 300, 250
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    edges = pd.DataFrame({"src": src.astype(np.int64),
                          "dst": dst.astype(np.int64)})
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    got = _cc_impl(impl)(rd.from_pandas(edges).repartition(4),
                         rd.from_pandas(nodes)).to_pandas() \
        .set_index("node")["label"]
    # union-find reference
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(src, dst):
        parent[find(a)] = find(b)
    roots = np.array([find(i) for i in range(n)])
    # min node id per component
    want = pd.Series(np.arange(n)).groupby(roots).transform("min").to_numpy()
    assert (got.sort_index().to_numpy() == want).all()


def test_funnel_counts_hand_case():
    import tslib_ray.pipelines.queries as qq
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2, 3, 3, 3], dtype=np.int64),
        "ts": pd.to_datetime(
            [10, 20, 30, 40, 35, 50, 45, 60], unit="s"),
        "event_type": ["view", "click", "purchase",   # u1 full funnel
                       "view", "click",               # u2 click BEFORE view
                       "view", "purchase", "click"],  # u3 stops at click
    })
    ds = rd.from_pandas(df).repartition(3)
    orig = qq._events
    try:
        qq._events = lambda sf, columns=None: ds.select_columns(columns)
        out = qq.q_funnel_counts("ignored").to_pandas() \
            .set_index("stage")["n_users"]
    finally:
        qq._events = orig
    assert out["view"] == 3
    assert out["click"] == 2   # u1 and u3 (u2's click precedes its view)
    assert out["purchase"] == 1  # u1 only (u3's purchase precedes click)


def test_resample_linear_hand_case():
    import tslib_ray.pipelines.queries as qq
    df = pd.DataFrame({
        "user_id": np.array([7, 7, 7], dtype=np.int64),
        "event_id": np.array([1, 2, 3], dtype=np.int64),
        # events at 00:30, 02:30, exactly 04:00
        "ts": pd.to_datetime([1800, 9000, 14400], unit="s"),
        "value": [10.0, 30.0, 50.0],
    })
    ds = rd.from_pandas(df).repartition(2)
    orig = qq._events
    try:
        qq._events = lambda sf, columns=None: ds.select_columns(columns)
        out = qq.q_resample_linear("ignored").to_pandas()
    finally:
        qq._events = orig
    out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
    got = out.set_index("bucket_ts")["value"]
    # grid 01:00..04:00; linear between (00:30,10)-(02:30,30)-(04:00,50)
    assert got[pd.Timestamp("1970-01-01 01:00:00")] == 15.0
    assert got[pd.Timestamp("1970-01-01 02:00:00")] == 25.0
    assert abs(got[pd.Timestamp("1970-01-01 03:00:00")]
               - (30 + 20 * (1800 / 5400))) < 1e-6
    assert got[pd.Timestamp("1970-01-01 04:00:00")] == 50.0  # exact hit
    assert len(got) == 4


def test_bloom_semi_join_exact_vs_isin():
    from tslib_ray.stages.join import bloom_semi_join, build_bloom
    import ray
    rng = np.random.default_rng(21)
    left = pd.DataFrame({
        "k": rng.integers(0, 10_000, 5000).astype(np.int64),
        "payload": rng.integers(0, 100, 5000).astype(np.int64)})
    right = pd.DataFrame({"rk": rng.integers(0, 10_000, 700)
                          .astype(np.int64)})
    got = bloom_semi_join(rd.from_pandas(left).repartition(4), "k",
                          rd.from_pandas(right).repartition(3), "rk",
                          m_bits=1 << 16, n_parts=5).to_pandas()
    want = left[left["k"].isin(right["rk"])]
    g = got.sort_values(["k", "payload"]).reset_index(drop=True)
    w = want.sort_values(["k", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["k", "payload"]], w[["k", "payload"]])
    # the bitmap itself must never produce a false negative
    bm = ray.get(build_bloom(rd.from_pandas(right), "rk", m_bits=1 << 16))
    from tslib_ray.stages.join import _bloom_positions
    keys = right["rk"].to_numpy()
    hit = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys, 1 << 16):
        hit &= (bm[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1) > 0
    assert hit.all()


def test_rollup_multi_key_matches_pandas(sf_small):
    from tslib_ray.pipelines.queries import QUERIES
    got = QUERIES["rollup_1h_by_type"][0](sf_small).to_pandas()
    raw = pd.read_parquet(f"{sf_small}/events.parquet",
                          columns=["user_id", "event_type", "ts", "value"])
    raw["bucket_ts"] = raw["ts"].dt.floor("h")
    want = raw.groupby(["user_id", "event_type", "bucket_ts"])["value"] \
        .agg(["sum", "min", "max", "count", "mean"]).reset_index()
    key = ["user_id", "event_type", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    # query output is 6dp-rounded (driver convention)
    np.testing.assert_allclose(got["sum_value"], want["sum"], atol=1e-6)
    np.testing.assert_allclose(got["mean_value"], want["mean"], atol=1e-6)
    np.testing.assert_array_equal(got["n"], want["count"])
