"""Round-4 coverage: ADVICE r03 fixes (bloom int64 fidelity, interval key
overflow, CC missing-endpoint / convergence guards, hamming radius) and
VERDICT r03 items (tree-reduced Bloom build, tfidf min_df cut, vectorized
MediaFeatures, large-star/small-star CC, registry growth guard)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd


# ---------------------------------------------------------------------------
# Bloom: tree reduce + int64 fidelity through the verify stage
# ---------------------------------------------------------------------------

def test_or_fold_tree_matches_flat_or():
    from tslib_ray.stages.join import _or_fold_tree
    words = 64
    rng = np.random.default_rng(0)
    bitmaps = [rng.integers(0, 2 ** 63, words, dtype=np.int64)
               .view(np.uint64) for _ in range(37)]
    refs = [ray.put(pa.table({"bm": pa.array([bm.tobytes()],
                                             type=pa.binary())}))
            for bm in bitmaps]
    root = ray.get(_or_fold_tree(refs, words, fan_in=3))
    got = np.frombuffer(root["bm"][0].as_py(), dtype=np.uint64)
    want = np.bitwise_or.reduce(np.stack(bitmaps))
    assert np.array_equal(got, want)


def test_or_fold_tree_single_ref_fetches_one_table():
    from tslib_ray.stages.join import _or_fold_tree
    bm = np.arange(8, dtype=np.uint64)
    ref = ray.put(pa.table({"bm": pa.array([bm.tobytes()],
                                           type=pa.binary())}))
    root = ray.get(_or_fold_tree([ref], 8))
    # the driver fetch is exactly ONE table no matter the input fan
    assert np.array_equal(
        np.frombuffer(root["bm"][0].as_py(), dtype=np.uint64), bm)


def test_bloom_semi_join_preserves_int64_above_2_53():
    """ADVICE r03 #1: the old pandas verify promoted null-padded int64
    payloads to float64, corrupting values above 2^53."""
    from tslib_ray.stages.join import bloom_semi_join
    big = np.array([2 ** 60 + 1, 2 ** 60 + 3, 2 ** 60 + 5, 7],
                   dtype=np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "payload_id": pa.array(big)}))
    right = rd.from_arrow(pa.table({"rk": pa.array([2, 4],
                                                   type=pa.int64())}))
    out = bloom_semi_join(left, "k", right, "rk",
                          m_bits=1 << 10, n_parts=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [2, 4]
    assert out["payload_id"].dtype == np.int64
    assert out["payload_id"].tolist() == [2 ** 60 + 3, 7]


# ---------------------------------------------------------------------------
# interval join: sub-second buckets / pre-1970 timestamps (key overflow)
# ---------------------------------------------------------------------------

def _brute_counts(pts, lo, hi):
    return [int(np.count_nonzero((pts >= a) & (pts < b)))
            for a, b in zip(lo, hi)]


@pytest.mark.parametrize("base_ts", [1_700_000_000_000_000, -5_000_000])
def test_interval_count_subsecond_buckets(base_ts):
    """bucket_us=1000 on epoch-us data drives ts // bucket_us far past
    2**31 — the old (bucket << 32) packing silently overflowed int64
    (ADVICE r03 #2); negative timestamps also broke the bit-OR."""
    from tslib_ray.stages.interval import interval_count_join
    rng = np.random.default_rng(1)
    pts = base_ts + rng.integers(0, 100_000, 5000)
    lo = base_ts + rng.integers(0, 99_000, 40)
    hi = lo + rng.integers(1, 1000, 40)
    points = rd.from_arrow(pa.table({"ts": pa.array(pts)}))
    ranges = rd.from_arrow(pa.table({
        "rid": pa.array(np.arange(40)), "lo": pa.array(lo),
        "hi": pa.array(hi)}))
    out = interval_count_join(points, ranges, "ts", "rid", "lo", "hi",
                              bucket_us=1000, n_parts=8).to_pandas()
    out = out.set_index("rid")["n"]
    want = _brute_counts(pts, lo, hi)
    for r in range(40):
        assert out.get(r, 0) == want[r], (r, out.get(r, 0), want[r])


# ---------------------------------------------------------------------------
# connected components: guards + large-star/small-star
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("small_rows", [0, 10 ** 6])
def test_cc_missing_endpoint_raises(small_rows):
    from tslib_ray.stages.graph import connected_components
    edges = rd.from_items([{"src": 1, "dst": 99}])
    nodes = rd.from_items([{"node": 1}])  # 99 absent
    with pytest.raises(Exception, match="missing from"):
        connected_components(edges, nodes,
                             small_graph_rows=small_rows).to_pandas()


def test_cc_actor_missing_endpoint_raises():
    from tslib_ray.stages.graph import connected_components_actors
    edges = rd.from_items([{"src": 1, "dst": 99}])
    nodes = rd.from_items([{"node": 1}])
    with pytest.raises(Exception, match="missing from"):
        connected_components_actors(edges, nodes, n_shards=2).to_pandas()


def test_cc_unconverged_raises():
    from tslib_ray.stages.graph import connected_components
    n = 40  # path graph needs ~n rounds under hash-min
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.arange(n - 1), "dst": np.arange(1, n)}))
    nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(n)}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_rounds=3,
                             small_graph_rows=0).to_pandas()


def test_stars_path_graph_log_rounds():
    """Kiveris large-star/small-star: a depth-1000 path converges (hash-min
    would need 1000 rounds; max_rounds=60 bounds this run to O(log n)).
    small_graph_rows=0 forces the distributed star rounds."""
    from tslib_ray.stages.graph import connected_components_stars
    n = 1000
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.arange(n - 1), "dst": np.arange(1, n)}))
    nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(n)}))
    out = connected_components_stars(edges, nodes, max_rounds=60,
                                     small_graph_rows=0).to_pandas()
    assert len(out) == n
    assert (out["label"] == 0).all()


def test_stars_matches_hashmin_random_graph():
    """Distributed star rounds == distributed hash-min == the single-task
    fast path (the round-4 small-graph gate), on the same random graph."""
    from tslib_ray.stages.graph import (connected_components,
                                        connected_components_stars)
    rng = np.random.default_rng(7)
    e = pd.DataFrame({"src": rng.integers(0, 300, 400),
                      "dst": rng.integers(0, 300, 400)})
    nodes = pd.DataFrame({"node": np.arange(300)})
    a = connected_components(rd.from_pandas(e), rd.from_pandas(nodes),
                             small_graph_rows=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = connected_components_stars(rd.from_pandas(e), rd.from_pandas(nodes),
                                   small_graph_rows=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    c = connected_components(rd.from_pandas(e), rd.from_pandas(nodes)) \
        .to_pandas().sort_values("node").reset_index(drop=True)  # fast path
    pd.testing.assert_frame_equal(a, c)


def test_stars_isolated_nodes_and_self_loops():
    from tslib_ray.stages.graph import connected_components_stars
    for small in (0, 10 ** 6):
        edges = rd.from_items([{"src": 5, "dst": 6}, {"src": 9, "dst": 9}])
        nodes = rd.from_items([{"node": k} for k in (1, 5, 6, 9)])
        out = connected_components_stars(
            edges, nodes, small_graph_rows=small).to_pandas() \
            .sort_values("node")
        assert out["label"].tolist() == [1, 5, 5, 9]


def test_small_cc_fast_path_deep_chain():
    """The single-task path handles a deep chain in O(log n) numpy rounds
    (pointer doubling), so the gate never trades correctness for speed."""
    from tslib_ray.stages.graph import connected_components
    n = 5000
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.arange(n - 1), "dst": np.arange(1, n)}))
    nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(n)}))
    out = connected_components(edges, nodes).to_pandas()
    assert len(out) == n and (out["label"] == 0).all()


# ---------------------------------------------------------------------------
# hamming ball radius generalization
# ---------------------------------------------------------------------------

def test_hamming_ball_radius_3_complete():
    from tslib_ray.stages.ann import _hamming_ball
    n_planes, bucket = 8, 0b10110010
    ball = _hamming_ball(bucket, n_planes, radius=3)
    brute = np.array([b for b in range(2 ** n_planes)
                      if bin(b ^ bucket).count("1") <= 3], dtype=np.uint32)
    assert np.array_equal(np.sort(ball), brute)
    # radius >= n_planes covers the whole space
    assert _hamming_ball(3, 4, radius=9).size == 16


# ---------------------------------------------------------------------------
# tfidf min_df cut
# ---------------------------------------------------------------------------

def _toy_docs():
    rows = [{"doc_id": 0, "text": "apple banana apple cherry"},
            {"doc_id": 1, "text": "banana cherry cherry"},
            {"doc_id": 2, "text": "apple durian banana"},
            {"doc_id": 3, "text": "elderberry elderberry banana"}]
    return rd.from_items(rows)


def test_tfidf_min_df_drops_rare_terms():
    from tslib_ray.stages.text import tfidf_topk
    base = tfidf_topk(_toy_docs(), k=10).to_pandas()
    cut = tfidf_topk(_toy_docs(), k=10, min_df=2).to_pandas()
    df_by_term = base.drop_duplicates("term").set_index("term")["df"]
    kept_terms = set(df_by_term[df_by_term >= 2].index)
    assert set(cut["term"]) == kept_terms
    # surviving (doc, term) rows keep identical tf/df/score
    merged = cut.merge(base, on=["doc_id", "term"], suffixes=("", "_b"))
    assert (merged["tf"] == merged["tf_b"]).all()
    assert (merged["df"] == merged["df_b"]).all()
    assert np.allclose(merged["tfidf"], merged["tfidf_b"])


def test_tfidf_broadcast_size_assert_fires():
    from tslib_ray.stages.text import tfidf_topk
    # ValueError, not AssertionError: `python -O` strips asserts, which
    # would silently disable the cap at scale (ADVICE r04)
    with pytest.raises(ValueError, match="min_df"):
        tfidf_topk(_toy_docs(), max_broadcast_mb=1e-9).to_pandas()


# ---------------------------------------------------------------------------
# MediaFeatures vectorization parity
# ---------------------------------------------------------------------------

def test_media_features_vectorized_matches_scalar_kernel():
    from tslib_ray.stages.multimodal import MediaFeatures, byte_features
    rng = np.random.default_rng(3)
    payloads = [rng.integers(0, 256, size=int(s)).astype(np.uint8).tobytes()
                for s in rng.integers(0, 3000, 64)]
    payloads[5] = b""
    t = pa.table({"media_type": pa.array(["image/png"] * 64),
                  "payload": pa.array(payloads, type=pa.binary())})
    for tt in (t, t.slice(9, 40)):  # nonzero Arrow array offset too
        out = MediaFeatures()(tt)
        for i in range(len(tt)):
            nb, ent, sm = byte_features(tt["payload"][i].as_py())
            assert out["n_bytes"][i].as_py() == nb
            assert out["byte_entropy"][i].as_py() == round(ent, 6)
            assert out["stride_mean"][i].as_py() == round(sm, 6)


# ---------------------------------------------------------------------------
# t-digest quantile sketch
# ---------------------------------------------------------------------------

def test_tdigest_rank_accuracy():
    """Estimates land within the t-digest rank-error bound: tighter at the
    tails (the k1 scale's point) than in the middle."""
    from tslib_ray.stages.tdigest import tdigest_from_sorted, tdigest_quantile
    rng = np.random.default_rng(11)
    x = np.sort(rng.normal(0, 1, 20_000))
    m, w = tdigest_from_sorted(x, np.ones(x.size), delta=200.0)
    assert m.size < 250  # real compression happened
    assert np.all(np.diff(m) >= 0)
    assert w.sum() == x.size
    for q, tol in ((0.5, 0.01), (0.95, 0.005), (0.99, 0.002)):
        est = tdigest_quantile(m, w, [q])[0]
        rank = np.searchsorted(x, est) / x.size
        assert abs(rank - q) <= tol, (q, rank)


def test_tdigest_merge_order_independent():
    from tslib_ray.stages.tdigest import (tdigest_from_sorted,
                                          tdigest_merge)
    rng = np.random.default_rng(5)
    a = np.sort(rng.normal(0, 1, 3000))
    b = np.sort(rng.exponential(2, 5000))
    da = tdigest_from_sorted(a, np.ones(a.size), 100.0)
    db = tdigest_from_sorted(b, np.ones(b.size), 100.0)
    m1, w1 = tdigest_merge(*da, *db, 100.0)
    m2, w2 = tdigest_merge(*db, *da, 100.0)
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
    assert w1.sum() == a.size + b.size


def test_tdigest_vectorized_multigroup_matches_single_group_kernel():
    """The all-groups-at-once partition path must reproduce the sequential
    per-group kernels bit-for-bit (the oracle-parity contract)."""
    from tslib_ray.stages.tdigest import (_cluster_all_groups,
                                          _quantiles_all_groups,
                                          tdigest_from_sorted,
                                          tdigest_quantile)
    rng = np.random.default_rng(2)
    gid, xs = [], []
    for g, n in enumerate(rng.integers(1, 800, 12)):
        gid.append(np.full(int(n), g, dtype=np.int64))
        xs.append(np.sort(rng.normal(g, 1 + g % 3, int(n))))
    gid = np.concatenate(gid)
    x = np.concatenate(xs)
    w = np.ones(x.size)
    cgid, cm, cw = _cluster_all_groups(gid, x, w, 100.0)
    ggid, est = _quantiles_all_groups(cgid, cm, cw,
                                      np.array([0.5, 0.95, 0.99]))
    for g, xg in enumerate(xs):
        m_ref, w_ref = tdigest_from_sorted(xg, np.ones(xg.size), 100.0)
        sel = cgid == g
        assert np.array_equal(cm[sel], m_ref)
        assert np.array_equal(cw[sel], w_ref)
        p_ref = tdigest_quantile(m_ref, w_ref, (0.5, 0.95, 0.99))
        assert np.array_equal(est[:, g], p_ref)


def test_tdigest_sketch_rows_and_cascade():
    """tdigest_tier rows -> quantiles_from_sketch equals the direct raw
    path exactly (same digest); cascading 1m -> 1h stays inside the rank
    bound of the direct 1h digest."""
    from tslib_ray.stages.tdigest import (tdigest_cascade, tdigest_tier,
                                          tdigest_quantiles_from_sketch,
                                          tdigest_quantiles_per_key)
    rng = np.random.default_rng(9)
    n = 30_000
    ts = (np.datetime64("2026-01-01", "us")
          + rng.integers(0, 6 * 3600, n).astype("timedelta64[s]"))
    t = pa.table({"k": pa.array(rng.integers(0, 3, n)),
                  "ts": pa.array(ts.astype("datetime64[us]")),
                  "v": pa.array(rng.normal(10, 4, n))})
    ds = rd.from_arrow(t)
    direct = tdigest_quantiles_per_key(ds, "k", "ts", "v", "1h",
                                       n_parts=5).to_pandas() \
        .sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    sk_1m = tdigest_tier(ds, "k", "ts", "v", "1m", n_parts=5)
    sk_1h_direct = tdigest_tier(ds, "k", "ts", "v", "1h", n_parts=5)
    from_sketch = tdigest_quantiles_from_sketch(sk_1h_direct, "k",
                                                n_parts=5).to_pandas() \
        .sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(direct, from_sketch)
    cascaded = tdigest_quantiles_from_sketch(
        tdigest_cascade(sk_1m, "k", "1h", n_parts=5), "k",
        n_parts=5).to_pandas() \
        .sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    assert len(cascaded) == len(direct)
    # composed approximation: bounded drift, not bit-equality
    for c in ("p50", "p95", "p99"):
        assert np.allclose(cascaded[c], direct[c], rtol=0.05, atol=0.6)


def test_tdigest_weight_conservation_in_sketch():
    from tslib_ray.stages.tdigest import tdigest_tier
    rng = np.random.default_rng(4)
    n = 5000
    ts = (np.datetime64("2026-01-01", "us")
          + rng.integers(0, 3600, n).astype("timedelta64[s]"))
    ds = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 4, n)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "v": pa.array(rng.normal(0, 1, n))}))
    sk = tdigest_tier(ds, "k", "ts", "v", "1h", n_parts=3).to_pandas()
    assert sk["weight"].sum() == n


# ---------------------------------------------------------------------------
# quantile-oracle expression parity (the knife-edge guard)
# ---------------------------------------------------------------------------

def test_qcont_sql_matches_numpy_expression_exactly():
    """The explicit-interpolation SQL (queries.py::_qcont_cols) must equal
    the numpy expression lo + (hi - lo) * frac BIT-FOR-BIT — DuckDB's
    quantile_cont lerps differently in the last ulp, which flipped the 6dp
    rounding of gap_quantiles at sf0.01 (round 4). Fuzzed, zero tolerance."""
    import duckdb
    from tslib_ray.pipelines.queries import _qcont_cols, _qcont_out
    rng = np.random.default_rng(21)
    rows = []
    for g in range(40):
        n = int(rng.integers(1, 60))
        for x in rng.normal(0, 1e5, n):
            rows.append((g, float(x)))
    df = pd.DataFrame(rows, columns=["k", "v"])
    con = duckdb.connect()
    con.register("src", df)
    sql = f"""
        WITH r AS (
            SELECT k, v,
                   row_number() OVER (PARTITION BY k ORDER BY v) - 1 AS rk,
                   COUNT(*) OVER (PARTITION BY k) AS n
            FROM src),
        a AS (SELECT k, {_qcont_cols('v', 0.5, '50')},
                        {_qcont_cols('v', 0.95, '95')}
              FROM r GROUP BY k)
        SELECT k, {_qcont_out('50', 'p50')}, {_qcont_out('95', 'p95')}
        FROM a ORDER BY k"""
    want = con.sql(sql).df()
    for g, sub in df.groupby("k"):
        v = np.sort(sub["v"].to_numpy())
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            pos = q * (v.size - 1)
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, v.size - 1)
            est = v[lo] + (v[hi] - v[lo]) * frac
            est = np.floor(est * 1e6 + 0.5) / 1e6
            assert est == want.loc[want["k"] == g, col].iloc[0], (g, col)


# ---------------------------------------------------------------------------
# edge cases
# ---------------------------------------------------------------------------

def test_tdigest_stage_empty_input():
    """Zero-row input keeps the OUTPUT SCHEMA visible (Dataset.schema());
    Ray's to_pandas() drops columns for ANY zero-row Dataset, so the
    contract is checked at the Arrow level."""
    from tslib_ray.stages.tdigest import tdigest_quantiles_per_key
    ds = rd.from_arrow(pa.table({
        "k": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "v": pa.array([], type=pa.float64())}))
    out = tdigest_quantiles_per_key(ds, "k", "ts", "v", "1h")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "bucket_ts", "p50", "p95",
                                       "p99"}


def test_bloom_semi_join_empty_sides():
    """An empty build side must prune EVERYTHING (all-zeros bitmap) without
    tripping the fold tree or the tagged-schema inference."""
    from tslib_ray.stages.join import bloom_semi_join
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], type=pa.int64()),
                                   "p": pa.array([10, 20])}))
    right_empty = rd.from_arrow(pa.table({"rk": pa.array([],
                                                         type=pa.int64())}))
    out = bloom_semi_join(left, "k", right_empty, "rk",
                          m_bits=1 << 10, n_parts=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "p"}


# ---------------------------------------------------------------------------
# registry growth guard (VERDICT r03 item 8)
# ---------------------------------------------------------------------------

def test_every_registry_query_has_an_oracle():
    """A query without an oracle gets no CORRECTNESS row — fail fast when
    one lands (VERDICT r03 item 8)."""
    from tslib_ray.pipelines.queries import QUERIES
    missing = [name for name, (_fn, sql) in QUERIES.items() if sql is None]
    assert missing == [], f"queries without oracle entries: {missing}"


def test_registry_front_window_has_never_verified_queries_first():
    """The driver checks the FIRST 50 entries; round 5 leads with the six
    never-verified round-4c queries and ALSO aliases them at positions
    57-62 so a shifted window still produces a row for each."""
    from tslib_ray.pipelines.queries import (QUERIES, _NEVER_VERIFIED,
                                             _ROUND5_FRONT)
    names = list(QUERIES)
    assert names[:len(_ROUND5_FRONT)] == _ROUND5_FRONT
    assert names[:6] == _NEVER_VERIFIED
    assert names[56:62] == [f"{k}_w2" for k in _NEVER_VERIFIED]
    assert len(names) == len(set(names))
