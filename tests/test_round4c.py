"""Round-4c additions: Misra-Gries heavy hitters, KMV set operations,
per-group n-gram top-k, integer-exact CUSUM alerts — estimator regimes and
partition-invariance (the exact regimes are SQL-oracle-checked via the
registry)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tslib_ray.stages.freq import _mg_truncate, heavy_hitters
from tslib_ray.stages.sample import kmv_set_ops
from tslib_ray.stages.text import ngram_topk_by_group


# ---------------------------------------------------------------------------
# heavy_hitters (Misra-Gries)
# ---------------------------------------------------------------------------

def _zipf_items(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.zipf(1.5, size=n).clip(max=5000)


def test_mg_truncate_bounds():
    items = np.arange(100).astype(str).astype(object)
    counts = np.arange(1, 101, dtype=np.int64)
    it, ct, dec = _mg_truncate(items, counts, 10)
    assert it.size <= 10
    assert dec == 90  # the 11th-largest count
    # surviving counts are the originals minus dec
    assert (ct == counts[-it.size:] - dec).all()
    # no-op below capacity
    it2, ct2, dec2 = _mg_truncate(items[:5], counts[:5], 10)
    assert dec2 == 0 and it2.size == 5


def test_heavy_hitters_exact_regime_matches_value_counts():
    vals = _zipf_items(20_000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(6)
    out = heavy_hitters(ds, "x", k=10, capacity=100_000).to_pandas()
    assert (out["err_bound"] == 0).all()
    vc = pd.Series(vals).astype(str).value_counts()
    ref = vc.rename_axis("item").reset_index(name="n") \
        .sort_values(["n", "item"], ascending=[False, True],
                     kind="mergesort").head(10)
    assert out["item"].tolist() == ref["item"].tolist()
    assert out["n"].tolist() == ref["n"].tolist()


def test_heavy_hitters_estimator_regime_lower_bound_within_budget():
    """Tiny capacity forces MG truncation: every reported count must be a
    lower bound on the true count, within the global error budget, and the
    budget must respect the n/capacity guarantee."""
    vals = _zipf_items(20_000, seed=11)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    cap = 64
    out = heavy_hitters(ds, "x", k=10, capacity=cap).to_pandas()
    err = int(out["err_bound"].iloc[0])
    assert err > 0
    true = pd.Series(vals).astype(str).value_counts()
    for item, n in zip(out["item"], out["n"]):
        t = int(true[item])
        assert n <= t <= n + err, (item, n, t, err)
    # the bound accumulates per truncation; each block's decrement is
    # <= block_rows/capacity, so the total is <= rows/capacity... per
    # merge level — allow the final-pass truncation too (2x)
    assert err <= 2 * len(vals) // cap


def test_heavy_hitters_partition_invariant_when_exact():
    vals = _zipf_items(5_000, seed=3)
    outs = []
    for parts in (2, 9):
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts)
        outs.append(heavy_hitters(ds, "x", k=10,
                                  capacity=100_000).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# kmv_set_ops
# ---------------------------------------------------------------------------

def test_kmv_set_ops_exact_regime():
    a = pd.DataFrame({"u": np.repeat(np.arange(300), 3)})        # 0..299
    b = pd.DataFrame({"u": np.repeat(np.arange(200, 700), 2)})   # 200..699
    out = kmv_set_ops(rd.from_pandas(a).repartition(4),
                      rd.from_pandas(b).repartition(5),
                      "u", k=4096).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_a, r.n_b, r.n_union, r.n_intersect) == (300, 500, 700, 100)


def test_kmv_set_ops_estimator_regime_close():
    """k=256 over 20k distinct per side: KMV relative error is
    ~1/sqrt(k) (~6%); assert within 4 sigma. The intersection rides the
    Jaccard share of the union sketch — looser, assert within 25%."""
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"u": rng.permutation(30_000)[:20_000]})
    b = pd.DataFrame({"u": rng.permutation(30_000)[:20_000]})
    true_i = np.intersect1d(a["u"], b["u"]).size
    true_u = np.union1d(a["u"], b["u"]).size
    out = kmv_set_ops(rd.from_pandas(a).repartition(4),
                      rd.from_pandas(b).repartition(4),
                      "u", k=256).to_pandas().iloc[0]
    for est, true in ((out.n_a, 20_000), (out.n_b, 20_000),
                      (out.n_union, true_u)):
        assert abs(est - true) / true < 4 / np.sqrt(256), (est, true)
    assert abs(out.n_intersect - true_i) / true_i < 0.25


def test_kmv_set_ops_partition_invariant():
    rng = np.random.default_rng(9)
    a = pd.DataFrame({"u": rng.integers(0, 5_000, size=8_000)})
    b = pd.DataFrame({"u": rng.integers(2_500, 9_000, size=8_000)})
    outs = []
    for parts in (2, 7):
        outs.append(kmv_set_ops(rd.from_pandas(a).repartition(parts),
                                rd.from_pandas(b).repartition(parts),
                                "u", k=128).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# ngram_topk_by_group
# ---------------------------------------------------------------------------

def _gram_ref(df: pd.DataFrame, n: int, k: int) -> pd.DataFrame:
    rows = []
    for grp, text in zip(df["g"], df["t"]):
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            rows.append((grp, " ".join(toks[i:i + n])))
    cnt = pd.DataFrame(rows, columns=["grp", "gram"]) \
        .groupby(["grp", "gram"], as_index=False).size() \
        .rename(columns={"size": "n"})
    cnt = cnt.sort_values(["grp", "n", "gram"],
                          ascending=[True, False, True], kind="mergesort")
    return cnt.groupby("grp").head(k).reset_index(drop=True)


def test_ngram_by_group_matches_reference_and_partitioning():
    rng = np.random.default_rng(2)
    words = np.array(["aa", "bb", "cc", "dd", "ee"])
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=200),
        "t": [" ".join(rng.choice(words, size=rng.integers(2, 12)))
              for _ in range(200)],
    })
    ref = _gram_ref(df, 2, 3)
    for parts in (2, 8):
        got = ngram_topk_by_group(
            rd.from_pandas(df).repartition(parts), "g", text_col="t",
            n=2, k=3).to_pandas().reset_index(drop=True)
        got["n"] = got["n"].astype(ref["n"].dtype)
        pd.testing.assert_frame_equal(got, ref)


def test_ngram_by_group_rejects_unigrams():
    with pytest.raises(ValueError):
        ngram_topk_by_group(rd.from_pandas(pd.DataFrame({"g": [], "t": []})),
                            "g", text_col="t", n=1)


# ---------------------------------------------------------------------------
# cusum_alerts partition-invariance (exactness vs SQL is oracle-checked)
# ---------------------------------------------------------------------------

def test_cusum_partition_invariant(sf_small):
    from tslib_ray.pipelines.queries import q_cusum_alerts
    import tslib_ray.stages.rollup as R

    outs = []
    for parts in (4, 64):
        orig = R._add_part
        # same query, different user-hash fan-out
        try:
            R._add_part = lambda ds, key, n, _o=orig: _o(ds, key, parts)
            outs.append(q_cusum_alerts(sf_small).to_pandas()
                        .sort_values("event_id").reset_index(drop=True))
        finally:
            R._add_part = orig
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# fused t-digest cascade plan
# ---------------------------------------------------------------------------

def test_tdigest_fused_cascade_bit_identical_to_staged(sf_small):
    """The single-exchange tier->cascade->quantiles plan must reproduce the
    staged three-shuffle chain EXACTLY (same kernels over the same
    partition contents)."""
    import ray.data as rd
    from tslib_ray.stages.tdigest import (tdigest_cascade,
                                          tdigest_cascade_quantiles,
                                          tdigest_quantiles_from_sketch,
                                          tdigest_tier)
    ds = rd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    staged = tdigest_quantiles_from_sketch(
        tdigest_cascade(
            tdigest_tier(ds, "event_type", "ts", "value", "1m",
                         delta=100.0),
            "event_type", "1h", delta=100.0),
        "event_type").to_pandas()
    fused = tdigest_cascade_quantiles(ds, "event_type", "ts", "value",
                                      "1m", "1h",
                                      delta=100.0).to_pandas()
    cols = ["event_type", "bucket_ts"]
    staged = staged.sort_values(cols, kind="mergesort") \
        .reset_index(drop=True)
    fused = fused.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(fused, staged)
    for c in ("p50", "p95", "p99"):
        assert (fused[c].to_numpy() == staged[c].to_numpy()).all()


# ---------------------------------------------------------------------------
# M4 downsample / cohort retention
# ---------------------------------------------------------------------------

def test_m4_matches_pandas_reference_and_partitioning():
    rng = np.random.default_rng(4)
    n = 3_000
    df = pd.DataFrame({
        "k": rng.integers(0, 20, size=n),
        "ts": pd.to_datetime("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 3_600_000, size=n), "ms"),
        "eid": np.arange(n),
        "v": rng.integers(0, 1000, size=n) / 100.0,
    })
    from tslib_ray.stages.downsample import m4_per_key_tier
    b = df.assign(bucket_ts=df["ts"].dt.floor("h"))
    b = b.sort_values(["k", "bucket_ts", "ts", "eid"], kind="mergesort")
    grp = b.groupby(["k", "bucket_ts"])
    ref = pd.DataFrame({
        "vmin": grp["v"].min(), "vmax": grp["v"].max(),
        "vfirst": grp["v"].first(), "vlast": grp["v"].last(),
    }).reset_index().rename(columns={"k": "k"})
    ref["bucket_ts"] = ref["bucket_ts"].astype("datetime64[us]")
    for parts in (1, 7):
        got = m4_per_key_tier(rd.from_pandas(df).repartition(parts),
                              "k", "ts", "v", "1h", "eid").to_pandas()
        got = got.sort_values(["k", "bucket_ts"], kind="mergesort") \
            .reset_index(drop=True)
        got["bucket_ts"] = got["bucket_ts"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(
            got[["k", "bucket_ts", "vmin", "vmax", "vfirst", "vlast"]],
            ref, check_dtype=False)


def test_m4_first_last_tiebreak_on_equal_ts():
    """Two rows with the SAME timestamp in one bucket: order_col decides
    first/last, split across blocks so the merge path resolves the tie."""
    from tslib_ray.stages.downsample import m4_per_key_tier
    ts = pd.to_datetime(["2024-01-01 00:10:00"] * 2)
    df = pd.DataFrame({"k": [1, 1], "ts": ts, "eid": [2, 1],
                       "v": [7.0, 3.0]})
    out = m4_per_key_tier(rd.from_pandas(df).repartition(2),
                          "k", "ts", "v", "1h", "eid").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.vfirst, r.vlast, r.vmin, r.vmax) == (3.0, 7.0, 3.0, 7.0)


def test_cohort_retention_partition_invariant(sf_small):
    from tslib_ray.pipelines.queries import q_cohort_retention
    import tslib_ray.stages.rollup as R
    outs = []
    for parts in (3, 64):
        orig = R._add_part
        try:
            R._add_part = lambda ds, key, n, _o=orig: _o(ds, key, parts)
            outs.append(q_cohort_retention(sf_small).to_pandas()
                        .sort_values(["cohort_day", "day_offset"])
                        .reset_index(drop=True))
        finally:
            R._add_part = orig
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# dict_out tier output encoding
# ---------------------------------------------------------------------------

def test_tier_dict_out_values_identical_to_flat():
    rng = np.random.default_rng(6)
    n = 5_000
    df = pd.DataFrame({
        "u": rng.integers(0, 50, size=n),
        "ts": pd.to_datetime("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 86_400_000, size=n), "ms"),
        "eid": np.arange(n),
    })
    from tslib_ray.stages.rollup import latency_tiers_from_events
    outs = []
    for dict_out in (False, True):
        ds = rd.from_pandas(df).repartition(4)
        out = latency_tiers_from_events(
            ds, key="u", ts_col="ts", order_col="eid", out_key="conv_id",
            n_parts=8, dict_out=dict_out).to_pandas()
        # pandas renders dictionary columns as Categorical — normalize
        for c in ("conv_id", "tier"):
            out[c] = out[c].astype(str)
        outs.append(out.sort_values(["conv_id", "tier", "bucket_ts"],
                                    kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
