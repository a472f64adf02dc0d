"""Round-3 batch-2 stage tests: broadcast joins, sign-LSH ANN, stratified
bottom-k sampling."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tslib_ray.stages import ann
from tslib_ray.stages.join import (broadcast_anti_join,
                                   broadcast_lookup_join,
                                   broadcast_semi_join)
from tslib_ray.stages.sample import stratified_sample


def _facts(n=200, seed=1):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "key": rng.integers(0, 20, n).astype(np.int64),
        "v": rng.standard_normal(n),
    })


def test_broadcast_semi_and_anti_join_partition_the_input():
    df = _facts()
    keys = np.array([3, 7, 11], dtype=np.int64)
    ds = rd.from_pandas(df).repartition(4)
    semi = broadcast_semi_join(ds, "key", keys).to_pandas()
    anti = broadcast_anti_join(ds, "key", keys).to_pandas()
    assert set(semi["id"]) == set(df.loc[df["key"].isin(keys), "id"])
    assert set(anti["id"]) == set(df.loc[~df["key"].isin(keys), "id"])
    assert len(semi) + len(anti) == len(df)


def test_broadcast_lookup_join_inner_semantics_and_payload():
    df = _facts()
    # lookup covers only even keys; odd-key rows must be dropped (inner)
    lk_keys = np.arange(0, 20, 2, dtype=np.int64)
    lookup = {"key": lk_keys,
              "label": np.array([f"seg{k}" for k in lk_keys])}
    out = broadcast_lookup_join(rd.from_pandas(df).repartition(3),
                                "key", lookup, "key").to_pandas()
    want = df[df["key"] % 2 == 0]
    assert len(out) == len(want)
    assert (out["label"] == out["key"].map(lambda k: f"seg{k}")).all()


def test_broadcast_lookup_join_key_above_range():
    # fact keys beyond the max lookup key exercise the searchsorted clamp
    df = pd.DataFrame({"key": np.array([5, 99], dtype=np.int64)})
    lookup = {"key": np.array([1, 5], dtype=np.int64),
              "label": np.array(["a", "b"])}
    out = broadcast_lookup_join(rd.from_pandas(df), "key",
                                lookup, "key").to_pandas()
    assert out["key"].tolist() == [5] and out["label"].tolist() == ["b"]


def _clustered_embeddings(n=400, d=16, n_clusters=8, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 4
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + rng.standard_normal((n, d)) * 0.3
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(vecs.astype(np.float32))})


def test_knn_lsh_probe_all_equals_brute():
    df = _clustered_embeddings()
    ds = rd.from_pandas(df).repartition(4)
    q = np.asarray(df["embedding"].iloc[0], dtype=np.float64)
    brute = ann.knn_brute(ds, q[None, :], k=10)
    lsh = ann.knn_lsh(ds, q[None, :], k=10, probe_all=True)
    assert lsh["vec_id"].tolist() == brute["vec_id"].tolist()
    assert np.array_equal(lsh["sim"].to_numpy(), brute["sim"].to_numpy())


def test_knn_lsh_multiprobe_recall_and_determinism():
    df = _clustered_embeddings()
    ds = rd.from_pandas(df).repartition(4)
    q = np.asarray(df["embedding"].iloc[3], dtype=np.float64)
    brute = set(ann.knn_brute(ds, q[None, :], k=10)["vec_id"])
    got1 = ann.knn_lsh(ds, q[None, :], k=10, n_planes=8, radius=2)
    got2 = ann.knn_lsh(rd.from_pandas(df).repartition(7), q[None, :],
                       k=10, n_planes=8, radius=2)
    # deterministic across partitionings
    assert got1["vec_id"].tolist() == got2["vec_id"].tolist()
    # clustered data: radius-2 multiprobe over 8 planes finds most of top-10
    recall = len(set(got1["vec_id"]) & brute) / 10
    assert recall >= 0.5, recall


def test_hamming_ball_sizes():
    assert len(ann._hamming_ball(0, 8, 0)) == 1
    assert len(ann._hamming_ball(0, 8, 1)) == 9
    assert len(ann._hamming_ball(0, 8, 2)) == 1 + 8 + 28


def test_stratified_sample_mergeable_and_partition_invariant():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "stratum": rng.choice(["a", "b", "c"], 500),
        "id": np.arange(500, dtype=np.int64),
    })
    out1 = stratified_sample(rd.from_pandas(df).repartition(2),
                             "stratum", "id", k=10).to_pandas()
    out2 = stratified_sample(rd.from_pandas(df).repartition(9),
                             "stratum", "id", k=10).to_pandas()
    key = ["stratum", "id"]
    a = out1.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (out1.groupby("stratum")["id"].count() == 10).all()


def test_stratified_sample_small_stratum_returns_all_rows():
    df = pd.DataFrame({"stratum": ["x"] * 3 + ["y"] * 40,
                       "id": np.arange(43, dtype=np.int64)})
    out = stratified_sample(rd.from_pandas(df), "stratum", "id",
                            k=10).to_pandas()
    assert (out["stratum"] == "x").sum() == 3
    assert (out["stratum"] == "y").sum() == 10


def test_resample_locf_semantics_and_partition_invariance():
    from tslib_ray.stages.gapfill import resample_locf
    ts = pd.to_datetime([
        "2024-01-01 00:10", "2024-01-01 00:10",  # tie: order 2 wins
        "2024-01-01 02:30",
        "2024-01-02 05:00",                      # other key
    ]).astype("datetime64[us]")
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "ts": ts,
        "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "value": np.array([10.0, 20.0, 30.0, 7.0]),
    })
    out = resample_locf(rd.from_pandas(df), freq_s=3600,
                        n_parts=4).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("bucket_ts")
    # grid: 00:00 (before first event -> dropped), 01:00, 02:00 carry the
    # tie-winning 20.0; the 02:30 event has no grid point after it within
    # span (02:00 < 02:30 = max ts -> grid ends at 02:00)
    assert u1["bucket_ts"].dt.hour.tolist() == [1, 2]
    assert u1["value"].tolist() == [20.0, 20.0]
    u2 = out[out["user_id"] == 2]
    assert u2["value"].tolist() == [7.0] and len(u2) == 1
    # partition invariance
    out2 = resample_locf(rd.from_pandas(df).repartition(3), freq_s=3600,
                         n_parts=1).to_pandas()
    a = out.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    b = out2.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bench_query_list_is_a_subset_of_queries():
    """bench.py's timed list must never drift from the registry."""
    import ast
    import pathlib
    from tslib_ray.pipelines.queries import QUERIES
    src = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    tree = ast.parse(src.read_text())
    names = {n.value for n in ast.walk(tree)
             if isinstance(n, ast.Constant) and isinstance(n.value, str)}
    benched = names & set(QUERIES)
    missing = benched - set(QUERIES)
    assert not missing
    # every round-3 addition is actually benchmarked
    for q in ("semijoin_top_users", "resample_locf", "join_priority_flag",
              "ann_lsh", "char_entropy", "grouping_sets"):
        assert q in benched, q
