"""Round-3 regression tests: all-pairs guards, short-doc minhash oracle
parity, scale-safe centroid training, incremental re-aggregation, streaming
ensemble equality (VERDICT r02 prescriptions)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tslib_ray.stages import ann, dedup


# ---------------------------------------------------------------------------
# exact all-pairs guards (VERDICT r02 item 5)
# ---------------------------------------------------------------------------

def test_allpairs_guard_raises_and_forces():
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        dedup._guard_allpairs(dedup.EXACT_ALLPAIRS_MAX_ROWS + 1, "op", False)
    dedup._guard_allpairs(dedup.EXACT_ALLPAIRS_MAX_ROWS + 1, "op", True)
    dedup._guard_allpairs(dedup.EXACT_ALLPAIRS_MAX_ROWS, "op", False)


def test_ngram_jaccard_guard_end_to_end(monkeypatch):
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [f"alpha beta gamma delta {i}" for i in range(8)],
    }))
    monkeypatch.setattr(dedup, "EXACT_ALLPAIRS_MAX_ROWS", 4)
    with pytest.raises(ValueError, match="ngram_jaccard_dedup_ids"):
        dedup.ngram_jaccard_dedup_ids(docs)
    out = dedup.ngram_jaccard_dedup_ids(docs, force=True).to_pandas()
    assert len(out) == 8  # all distinct -> all kept


def test_cosine_pairs_exact_guard(monkeypatch):
    rng = np.random.default_rng(3)
    emb = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": list(rng.normal(size=(6, 4))),
    }))
    monkeypatch.setattr(dedup, "EXACT_ALLPAIRS_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="cosine_pairs_exact"):
        ann.cosine_pairs_exact(emb, threshold=0.99)
    ann.cosine_pairs_exact(emb, threshold=0.99, force=True).to_pandas()


# ---------------------------------------------------------------------------
# scale-safe centroid training (VERDICT r02 item 1)
# ---------------------------------------------------------------------------

def test_train_centroids_bounded_driver_on_1m_corpus():
    """>10^6-vector corpus generated ON WORKERS; training must keep the
    driver footprint bounded (absolute sample cap + distributed Lloyd: only
    k x d partial sums ever reach the driver)."""
    import resource

    N, D, K = 1_200_000, 32, 8

    def gen(batch):
        ids = batch["id"].to_numpy()
        # deterministic per-row vectors, clustered on id % K
        rng = np.random.default_rng(int(ids[0]) + 1)
        base = np.eye(K, D) * 4.0
        m = base[ids % K] + rng.normal(size=(len(ids), D)) * 0.05
        import pyarrow as pa
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": pa.array(list(m))})

    emb = rd.range(N).map_batches(gen, batch_format="pyarrow")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
    cent = ann.train_centroids(emb, n_centroids=K, iters=2, seed=5)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert cent.shape == (K, D)
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    # corpus is ~300 MB of vectors; the driver high-water delta must stay
    # far below it (sample cap is 64*K rows; Lloyd partials are K x D)
    assert (rss1 - rss0) < 150_000, f"driver RSS grew {rss1 - rss0} KiB"
    # the trained centroids recover the planted cluster structure: every
    # planted direction has a centroid within cosine 0.99
    planted = np.eye(K, D)
    sims = planted @ cent.T
    assert (sims.max(axis=1) > 0.99).all()


def test_train_centroids_sample_cap_respected():
    """The effective sample fraction shrinks as the corpus grows: with a cap
    of C rows the driver pull is ~C rows regardless of n (the r02 fix for
    the unbounded fixed-fraction sample)."""
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "vec_id": np.arange(50_000, dtype=np.int64),
        "embedding": list(rng.normal(size=(50_000, 8))),
    })
    ds = rd.from_pandas(df)
    cap = 512
    sampled = ds.random_sample(min(1.0, 0.5, cap / 50_000), seed=5) \
        .limit(cap).count()
    assert sampled <= cap
    cent = ann.train_centroids(ds, n_centroids=4, sample_frac=0.5,
                               iters=1, max_sample_rows=cap)
    assert cent.shape == (4, 8)


# ---------------------------------------------------------------------------
# vectorized fingerprint kernel parity (VERDICT r02 item 3)
# ---------------------------------------------------------------------------

def _ref_fingerprint(text: str, window: int = 8) -> int:
    """Per-doc reference semantics (the pre-vectorization implementation)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    B = np.uint64(257)
    if b.size < window:
        h = np.uint64(0)
        for x in b:
            h = h * B + x
        return int(h)
    pows = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
    conv = np.lib.stride_tricks.sliding_window_view(b, window)
    return int((conv * pows).sum(axis=1, dtype=np.uint64).min())


def test_fingerprint_vectorized_matches_per_doc_reference():
    from tslib_ray.stages.text import fingerprint
    rng = np.random.default_rng(11)
    texts = ["", "ab", "abcdefg", "abcdefgh", "x" * 7 + "y" * 9,
             "z" * 200_000]  # last doc exceeds the 64 KiB chunk target
    texts += [" ".join(f"w{rng.integers(0, 50)}" for _ in
                       range(rng.integers(1, 120))) for _ in range(400)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = fingerprint(rd.from_pandas(df).repartition(5)).to_pandas() \
        .sort_values("doc_id")["fingerprint"].to_numpy(dtype=np.uint64)
    want = np.array([_ref_fingerprint(t) for t in texts], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# incremental re-aggregation == full recompute (VERDICT r02 missing item 1)
# ---------------------------------------------------------------------------

def test_incremental_rollup_equals_full_recompute(tmp_path, sf_small):
    import json
    import os
    import ray.data as rdata
    from tslib_ray.pipelines.flagship import incremental_rollup_1m
    from tslib_ray.stages import rollup as R

    out = str(tmp_path / "incr")
    inc = incremental_rollup_1m(sf_small, out_dir=out).to_pandas()
    full = R.rollup(
        rdata.read_parquet(f"{sf_small}/events.parquet",
                           columns=["user_id", "ts", "value"]),
        ["user_id"], "ts", "value", "1m").to_pandas()
    cols = ["user_id", "bucket_ts"]
    inc = inc.sort_values(cols).reset_index(drop=True)
    full = full.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc[full.columns], full)  # bit-identical

    # the manifest recorded both shards; a second incremental call reuses
    # them (no partials recomputed -> identical manifest lines)
    with open(os.path.join(out, "manifest.jsonl")) as f:
        first = sorted(f.read().splitlines())
    assert len(first) == 2
    inc2 = incremental_rollup_1m(sf_small, out_dir=out).to_pandas()
    with open(os.path.join(out, "manifest.jsonl")) as f:
        second = sorted(f.read().splitlines())
    assert second == first  # both shards skipped on rerun
    inc2 = inc2.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc2[full.columns], full)


# ---------------------------------------------------------------------------
# RSC donor weights surface (VERDICT r02 missing item 3)
# ---------------------------------------------------------------------------

def test_rsc_donor_weights_match_sequential_and_reconstruct():
    """Distributed donor-weight rows equal the sequential kernel loop, and
    weights actually reproduce the counterfactual: w . donors == predict."""
    from tslib_ray.pipelines.oracles import rsc_weights_frame
    from tslib_ray.sources.panel import synth_panel
    from tslib_ray.stages.panel import (_fit_one, rsc_donor_weights)

    panel, _ = synth_panel(n_experiments=4, seed=42)
    got = rsc_donor_weights(rd.from_pandas(panel), "treated", 4,
                            train_end=30).to_pandas()
    got["weight"] = np.floor(got["weight"].to_numpy() * 1e6 + 0.5) / 1e6
    got = got.sort_values(["experiment_id", "donor"]).reset_index(drop=True)
    want = rsc_weights_frame(1, 4) \
        .sort_values(["experiment_id", "donor"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # weights reconstruct the counterfactual for one experiment
    g = panel[panel["experiment_id"] == panel["experiment_id"].iloc[0]]
    rsc, _, donors, post_p, _ = _fit_one(g, "treated", 4, 30, "svd")
    w = rsc.get_control()
    donor_mat = np.vstack([post_p[u][0] for u in donors])
    np.testing.assert_allclose(
        w @ donor_mat, rsc.predict({u: post_p[u][0] for u in donors}))


# ---------------------------------------------------------------------------
# streaming per-key path == batch replay (VERDICT r02 missing item 2)
# ---------------------------------------------------------------------------

def test_streaming_sharded_models_equal_batch_replay():
    """Feed KeyShardedTSModels micro-batches in time order (the reference's
    UpdateModel streaming shape, testScriptSingleTimeSeriesMultipleModels).
    Per-key denoised output must equal a sequential single-process replay of
    the SAME micro-batches — proving the distributed layer (crc32 sharding,
    actor routing, per-batch barrier) adds nothing to the math.  NOTE the
    cadence matters by design: the ensemble's gamma rule decides full-refit
    vs folding-in from how many points arrived per update (the reference's
    TimesReconstructed/TimesUpdated semantics), so a one-shot feed is a
    *different* schedule; the invariant is same-cadence equality, plus
    closeness to the one-shot denoise."""
    from tslib_ray.kernels.tscascade import TSModelEnsemble
    from tslib_ray.stages.incremental import (KeyShardedTSModels,
                                              ensemble_denoised)

    params = dict(k=2, L=5, gamma=0.5, T0=30, rect_factor=3)
    rng = np.random.default_rng(9)
    keys = ["a", "b", "c"]
    series = {kk: np.cumsum(rng.normal(size=140)) + 10.0 for kk in keys}

    sharded = KeyShardedTSModels(n_shards=2, **params)
    seq = {kk: TSModelEnsemble(**params) for kk in keys}
    # interleaved micro-batches (4 shards of 35 points each, keys mixed)
    for lo in range(0, 140, 35):
        ks, vs = [], []
        for kk in keys:
            ks.extend([kk] * 35)
            vs.extend(series[kk][lo: lo + 35])
            seq[kk].update_model(series[kk][lo: lo + 35])
        sharded.update_batch(np.array(ks), np.array(vs))

    assert sharded.offsets() == {kk: 140 for kk in keys}
    for kk in keys:
        got = sharded.denoised(kk)
        want = seq[kk].denoise_ts()
        np.testing.assert_array_equal(got, want)  # distributed == sequential
        assert got.size > 0  # the stream actually produced denoised points
        # and the streamed result tracks the one-shot batch denoise closely
        # (different refit schedule -> not bit-equal, but same signal)
        one_shot = ensemble_denoised(series[kk], **params)
        m = np.isfinite(one_shot[: got.size])
        np.testing.assert_allclose(got[: one_shot.size][m[: got.size]],
                                   one_shot[: got.size][m], rtol=0.08)


# ---------------------------------------------------------------------------
# short-doc minhash oracle parity (ADVICE r02)
# ---------------------------------------------------------------------------

def test_minhash_short_doc_engine_matches_sql():
    """Fixture with sub-k-token docs (k=3): identical short docs must dedup
    at Jaccard 1.0 in BOTH the engine and the SQL oracle (the engine
    substitutes a whole-doc hash; the SQL now mirrors it as [text])."""
    import duckdb
    from tslib_ray.pipelines.queries import _minhash_sql
    df = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": [
            "red fox",              # 2 tokens, short
            "red fox",              # identical short dup -> dropped
            "blue",                 # 1 token, unique
            "red fox jumps over the lazy dog tonight",
            "red fox jumps over the lazy dog tonight",  # long dup -> dropped
            "red",                  # short, differs from 'blue'
            "completely different words entirely here now",
        ],
    })
    kept = dedup.dedup_minhash_ids(rd.from_pandas(df), threshold=0.8) \
        .to_pandas()["doc_id"].sort_values().to_numpy()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(_minhash_sql()).df()["doc_id"].sort_values().to_numpy()
    np.testing.assert_array_equal(kept, want)
    assert 1 not in kept and 4 not in kept  # both dup kinds dropped


# ---------------------------------------------------------------------------
# as-of join + rolling window (stages/asof.py)
# ---------------------------------------------------------------------------

def _asof_fixture():
    ts = pd.to_datetime([10, 20, 30, 40], unit="s")
    left = pd.DataFrame({
        "lid": np.arange(4, dtype=np.int64),
        "k": ["a", "a", "a", "b"],
        "ts": ts,
    })
    right = pd.DataFrame({
        "k": ["a", "a", "c"],
        "ts": pd.to_datetime([15, 30, 5], unit="s"),
        "v": [1.5, 2.5, 9.0],
    })
    return left, right


def test_asof_join_backward_left_and_inner():
    from tslib_ray.stages.asof import asof_join
    left, right = _asof_fixture()
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="k", on="ts", right_cols=["v"], suffix="_p",
                    how="left").to_pandas().sort_values("lid")
    # lid0: ts=10 < all right -> null; lid1: ts=20 -> v=1.5 (ts15);
    # lid2: ts=30 -> inclusive match v=2.5; lid3: key b has no right rows
    assert out["v_p"].tolist()[1:3] == [1.5, 2.5]
    assert np.isnan(out["v_p"].tolist()[0]) and np.isnan(out["v_p"].tolist()[3])
    assert out["lid"].dtype == np.int64  # dtype restored despite null padding
    inner = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      by="k", on="ts", right_cols=["v"], suffix="_p",
                      how="inner").to_pandas().sort_values("lid")
    assert inner["lid"].tolist() == [1, 2] and inner["v_p"].tolist() == [1.5, 2.5]


def test_asof_join_forward():
    from tslib_ray.stages.asof import asof_join
    left, right = _asof_fixture()
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="k", on="ts", right_cols=["v"], suffix="_n",
                    direction="forward", how="left"
                    ).to_pandas().sort_values("lid")
    # forward: smallest right ts >= left ts (inclusive)
    assert out["v_n"].tolist()[0:3] == [1.5, 2.5, 2.5]
    assert np.isnan(out["v_n"].tolist()[3])


def test_rolling_window_range_peers_and_bounds():
    from tslib_ray.stages.asof import rolling_window_agg
    # equal-ts peers must ALL be included in each other's frame (RANGE)
    df = pd.DataFrame({
        "k": ["a"] * 4,
        "ts": pd.to_datetime([0, 3600, 3600, 7201], unit="s"),
        "v": [1.0, 2.0, 4.0, 8.0],
    })
    out = rolling_window_agg(rd.from_pandas(df), by="k", on="ts",
                             value_col="v", window=pd.Timedelta(hours=1)
                             ).to_pandas().sort_values(["ts", "v"])
    # row0: [t-1h, t] = itself; rows at 3600 include row0 (inclusive) and
    # each other (peers); row at 7201 excludes everything (<6001 out)
    assert out["w_count"].tolist() == [1, 3, 3, 1]
    assert out["w_sum"].tolist() == [1.0, 7.0, 7.0, 8.0]


# ---------------------------------------------------------------------------
# job entrypoint (python -m tslib_ray / ray job submit surface)
# ---------------------------------------------------------------------------

def test_job_entrypoint_runs_and_resumes(tmp_path):
    from tslib_ray.__main__ import main
    out = str(tmp_path / "job_out")
    argv = ["--input", "/root/testdata/sf0.001/events.parquet",
            "--out", out]
    m1 = main(argv)
    assert m1["shards"] == 1 and m1["skipped_shards"] == 0
    assert m1["tiers"]["1m"] > m1["tiers"]["1h"] > m1["tiers"]["1d"] > 0
    assert (tmp_path / "job_out" / "manifest.jsonl").exists()
    # rerun: every shard and tier is skipped via the manifest, rows identical
    m2 = main(argv)
    assert m2["skipped_shards"] == 1
    assert m2["tiers"] == m1["tiers"]
    assert m2["wall_s"] < m1["wall_s"]


def test_job_entrypoint_input_resolution(tmp_path):
    from tslib_ray.__main__ import _resolve_inputs
    import pytest as _pytest
    d = tmp_path / "in"; d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    (d / "sub").mkdir(); (d / "sub" / "b.parquet").write_bytes(b"x")
    assert len(_resolve_inputs(str(d))) == 2          # recursive dir
    assert len(_resolve_inputs(str(d / "*.parquet"))) == 1  # glob
    assert _resolve_inputs(str(d / "a.parquet")) == [str(d / "a.parquet")]
    with _pytest.raises(SystemExit):
        _resolve_inputs(str(d / "nope*.parquet"))


def test_quantiles_per_key_matches_numpy_and_parallelism_invariant():
    from tslib_ray.stages.rollup import quantiles_per_key
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 6 * 3600, n), unit="s"),
        "v": rng.normal(50, 20, n),
    })
    out = quantiles_per_key(rd.from_pandas(df), "k", "ts", "v", "1h",
                            n_parts=8).to_pandas()
    df["b"] = df["ts"].dt.floor("h")
    ref = df.groupby(["k", "b"])["v"].quantile([0.5, 0.95, 0.99]).unstack()
    ref.columns = ["p50", "p95", "p99"]
    ref = ref.reset_index().rename(columns={"b": "bucket_ts"})
    merged = out.merge(ref, on=["k", "bucket_ts"], suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    for c in ("p50", "p95", "p99"):
        np.testing.assert_allclose(merged[c], merged[c + "_ref"], atol=1e-12)
    # partitioning must not change values (exact, not sketched)
    out2 = quantiles_per_key(rd.from_pandas(df.drop(columns=["b"])),
                             "k", "ts", "v", "1h", n_parts=3).to_pandas()
    a = out.sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    c2 = out2.sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c2)


# ---------------------------------------------------------------------------
# mergeable histogram quantile sketch (stages/sketch.py)
# ---------------------------------------------------------------------------

def _sketch_df(n=6000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "ts": pd.to_datetime(rng.integers(0, 3 * 86400, n), unit="s"),
        "v": rng.uniform(0, 100, n),
    })


def test_histogram_cascade_bit_identical_to_direct():
    from tslib_ray.stages import sketch
    df = _sketch_df()
    ds = rd.from_pandas(df)
    s1m = sketch.histogram_tier(ds, "k", "ts", "v", "1m", 0.0, 100.0, 50,
                                n_parts=8)
    via_cascade = sketch.histogram_cascade(s1m, "k", "1h", n_parts=8) \
        .to_pandas().sort_values(["k", "bucket_ts", "bin"]) \
        .reset_index(drop=True)
    direct = sketch.histogram_tier(rd.from_pandas(df), "k", "ts", "v", "1h",
                                   0.0, 100.0, 50, n_parts=3) \
        .to_pandas().sort_values(["k", "bucket_ts", "bin"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(via_cascade, direct)


def test_histogram_quantiles_within_bin_width_of_exact():
    from tslib_ray.stages import sketch
    df = _sketch_df()
    n_bins, lo, hi = 50, 0.0, 100.0
    ds = rd.from_pandas(df)
    sk = sketch.histogram_tier(ds, "k", "ts", "v", "1d", lo, hi, n_bins,
                               n_parts=8)
    est = sketch.quantiles_from_histogram(sk, "k", lo, hi, n_bins,
                                          qs=(0.5, 0.95), n_parts=8
                                          ).to_pandas()
    df["b"] = df["ts"].dt.floor("D")
    exact = df.groupby(["k", "b"])["v"].quantile([0.5, 0.95]).unstack()
    exact.columns = ["p50", "p95"]
    exact = exact.reset_index().rename(columns={"b": "bucket_ts"})
    m = est.merge(exact, on=["k", "bucket_ts"], suffixes=("", "_ex"))
    assert len(m) == len(exact) == len(est)
    w = (hi - lo) / n_bins
    assert (m["p50"] - m["p50_ex"]).abs().max() <= w
    assert (m["p95"] - m["p95_ex"]).abs().max() <= w


def test_histogram_clamps_out_of_range():
    from tslib_ray.stages import sketch
    df = pd.DataFrame({"k": [1, 1, 1], "ts": pd.to_datetime([0, 1, 2],
                                                            unit="s"),
                       "v": [-5.0, 50.0, 999.0]})
    sk = sketch.histogram_tier(rd.from_pandas(df), "k", "ts", "v", "1h",
                               0.0, 100.0, 10, n_parts=2).to_pandas()
    assert sorted(sk["bin"].tolist()) == [0, 5, 9]
    assert sk["n"].sum() == 3


def test_token_counter_matches_duckdb_on_regex_edges():
    """Pins the SQL-escaping contract: backslashes pass through DuckDB
    single-quoted literals untouched (doubling them silently changes the
    RE2 class and diverges on backslash-bearing docs — regression test)."""
    import duckdb
    from tslib_ray.stages.text import TokenCounter
    t = pd.DataFrame({"text": ["a\tb", "x ", "a\\b", "tab\t\tend",
                               "it's 42!", "", "  ", "€ uni—code"]})
    eng = TokenCounter()(t.copy())["n_bpe_tokens"].tolist()
    sql = duckdb.sql(
        "SELECT " + TokenCounter.sql("t.text") + " AS n FROM t"
    ).df()["n"].tolist()
    assert eng == sql


# ---------------------------------------------------------------------------
# HLL distinct sketch (stages/distinct.py)
# ---------------------------------------------------------------------------

def test_hll_cascade_bit_identical_to_direct():
    from tslib_ray.stages import distinct
    df = _sketch_df()
    df["item"] = "u" + (df["v"] * 37).astype(int).astype(str)
    ds = rd.from_pandas(df)
    s1h = distinct.hll_tier(ds, "k", "ts", "item", "1h", p=8, n_parts=8)
    via = distinct.hll_cascade(s1h, "k", "1d", n_parts=8).to_pandas() \
        .sort_values(["k", "bucket_ts", "reg"]).reset_index(drop=True)
    direct = distinct.hll_tier(rd.from_pandas(df), "k", "ts", "item", "1d",
                               p=8, n_parts=3).to_pandas() \
        .sort_values(["k", "bucket_ts", "reg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(via, direct)


def test_hll_estimate_within_standard_error():
    from tslib_ray.stages import distinct
    # planted cardinalities spanning the linear-counting and raw regimes
    rows = []
    for key, n_distinct in (("a", 60), ("b", 2000), ("c", 20000)):
        items = [f"{key}-{i}" for i in range(n_distinct)] * 2
        rows.append(pd.DataFrame({
            "k": key, "ts": pd.Timestamp("2024-01-01"), "item": items}))
    ds = rd.from_pandas(pd.concat(rows, ignore_index=True))
    sk = distinct.hll_tier(ds, "k", "ts", "item", "1d", p=10, n_parts=4)
    est = distinct.hll_estimate(sk, "k", p=10, n_parts=4).to_pandas() \
        .set_index("k")["n_distinct"]
    for key, n_distinct in (("a", 60), ("b", 2000), ("c", 20000)):
        assert abs(est[key] - n_distinct) / n_distinct < 0.10, (
            key, est[key], n_distinct)


def test_hll_merge_order_invariant():
    """max-merge must be deterministic under any partitioning."""
    from tslib_ray.stages import distinct
    df = _sketch_df(n=2000)
    df["item"] = "x" + (df["v"] * 11).astype(int).astype(str)
    a = distinct.hll_tier(rd.from_pandas(df), "k", "ts", "item", "1d",
                          p=6, n_parts=2).to_pandas()
    b = distinct.hll_tier(rd.from_pandas(df.iloc[::-1]), "k", "ts", "item",
                          "1d", p=6, n_parts=7).to_pandas()
    key = ["k", "bucket_ts", "reg"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


# ---------------------------------------------------------------------------
# LTTB downsample (stages/downsample.py)
# ---------------------------------------------------------------------------

def test_lttb_kernel_properties():
    from tslib_ray.stages.downsample import lttb_indices
    rng = np.random.default_rng(9)
    ts = np.sort(rng.integers(0, 10**9, 500))
    v = rng.normal(size=500)
    idx = lttb_indices(ts, v, 20)
    assert idx.size == 20 and idx[0] == 0 and idx[-1] == 499
    assert np.all(np.diff(idx) > 0)
    # n <= n_out: passthrough
    assert np.array_equal(lttb_indices(ts[:5], v[:5], 20), np.arange(5))
    # spike preservation: a huge outlier must be selected
    v2 = np.zeros(500); v2[237] = 1e6
    assert 237 in lttb_indices(ts, v2, 20)


def test_lttb_distributed_equals_sequential(sf_small):
    from tslib_ray.stages.downsample import lttb_frame, lttb_per_key
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    seq = pd.concat(
        [lttb_frame(g, "ts", "value", 16, ["ts", "event_id"])
         for _, g in ev.groupby("user_id", sort=True)],
        ignore_index=True)
    ds = rd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    dist = lttb_per_key(ds, "user_id", "ts", "value", n_out=16,
                        tiebreak="event_id", n_parts=8).to_pandas()
    key = ["user_id", "event_id"]
    pd.testing.assert_frame_equal(
        dist[seq.columns].sort_values(key).reset_index(drop=True),
        seq.sort_values(key).reset_index(drop=True))


def test_compact_retention_serves_each_bucket_once(sf_small):
    from tslib_ray.pipelines.queries import q_compact_retention
    out = q_compact_retention(sf_small).to_pandas()
    assert set(out["tier"]) <= {"1m", "1d"}
    cut_fine = out.loc[out["tier"] == "1m", "bucket_ts"].min()
    cut_coarse = out.loc[out["tier"] == "1d", "bucket_ts"].max()
    # coarse rows end strictly before the first fine day
    assert cut_coarse < cut_fine.floor("D") + pd.Timedelta(0)
    # no (user, minute-of-day) served by both tiers
    fine_days = set(out.loc[out["tier"] == "1m", "bucket_ts"].dt.floor("D"))
    coarse_days = set(out.loc[out["tier"] == "1d", "bucket_ts"])
    assert not (fine_days & coarse_days)


# ---------------------------------------------------------------------------
# per-key ordered window ops (stages/window.py)
# ---------------------------------------------------------------------------

def _series_df(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "eid": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 2 * 86400, n), unit="s"),
        # sawtooth-ish counter with planted resets
        "v": np.round(np.abs(np.cumsum(rng.normal(1, 3, n))) % 500, 2),
    })
    return df


def test_counter_increase_matches_pandas_reference():
    from tslib_ray.stages.window import counter_increase
    df = _series_df()
    got = counter_increase(rd.from_pandas(df), "k", "ts", "v", "1h",
                           tiebreak="eid", n_parts=7).to_pandas()
    s = df.sort_values(["k", "ts", "eid"], kind="mergesort")
    delta = s.groupby("k", sort=False)["v"].diff()
    inc = np.where(delta < 0, s["v"], delta)
    ref = pd.DataFrame({"k": s["k"], "bucket_ts": s["ts"].dt.floor("h"),
                        "increase": inc, "n": delta.notna()})
    ref = ref[delta.notna()].groupby(["k", "bucket_ts"], as_index=False) \
        .agg(increase=("increase", "sum"), n_deltas=("n", "sum"))
    key = ["k", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    assert np.array_equal(got["n_deltas"], ref["n_deltas"])
    np.testing.assert_allclose(got["increase"], ref["increase"], atol=1e-9)
    ref["bucket_ts"] = ref["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[key], ref[key], check_dtype=False)


def test_counter_increase_partition_invariant():
    from tslib_ray.stages.window import counter_increase
    df = _series_df(seed=12)
    key = ["k", "bucket_ts"]
    a = counter_increase(rd.from_pandas(df), "k", "ts", "v", "1h",
                         tiebreak="eid", n_parts=3).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = counter_increase(rd.from_pandas(df.iloc[::-1]), "k", "ts", "v", "1h",
                         tiebreak="eid", n_parts=11).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_twa_matches_pandas_reference():
    from tslib_ray.stages.window import time_weighted_avg
    df = _series_df(seed=13)
    got = time_weighted_avg(rd.from_pandas(df), "k", "ts", "v", "1h",
                            tiebreak="eid", n_parts=5).to_pandas()
    rows = []
    for (k, b), g in df.assign(bucket=df["ts"].dt.floor("h")) \
            .groupby(["k", "bucket"], sort=True):
        g = g.sort_values(["ts", "eid"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        end = np.int64(pd.Timestamp(b).value // 1000 + 3_600_000_000)
        w = np.append(np.diff(ts), end - ts[-1]).astype(np.float64)
        rows.append((k, b, float((g["v"].to_numpy() * w).sum() / w.sum()),
                     len(g)))
    ref = pd.DataFrame(rows, columns=["k", "bucket_ts", "twa", "n_samples"])
    key = ["k", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(got["twa"], ref["twa"], rtol=1e-12)
    assert np.array_equal(got["n_samples"], ref["n_samples"])


def test_twa_constant_series_equals_constant():
    """TWA of a constant series is that constant regardless of spacing."""
    from tslib_ray.stages.window import time_weighted_avg
    df = pd.DataFrame({
        "k": ["a"] * 5, "eid": range(5),
        "ts": pd.to_datetime([0, 1, 10, 100, 3599], unit="s"),
        "v": [7.5] * 5})
    out = time_weighted_avg(rd.from_pandas(df), "k", "ts", "v", "1h",
                            tiebreak="eid", n_parts=2).to_pandas()
    assert len(out) == 1 and out["twa"].iloc[0] == 7.5


# ---------------------------------------------------------------------------
# sampling operators (stages/sample.py)
# ---------------------------------------------------------------------------

def test_hash_split_deterministic_and_complete():
    from tslib_ray.stages.sample import hash_split
    ids = pd.DataFrame({"doc_id": np.arange(20000, dtype=np.int64)})
    a = hash_split(rd.from_pandas(ids), "doc_id").to_pandas()
    b = hash_split(rd.from_pandas(ids.iloc[::-1]), "doc_id").to_pandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m["split_a"] == m["split_b"]).all()
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.01
    assert abs(frac["val"] - 0.05) < 0.005
    assert abs(frac["test"] - 0.05) < 0.005


def test_hash_split_rejects_bad_fractions():
    from tslib_ray.stages.sample import split_thresholds
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.3})


def test_kmv_merge_and_cascade_bit_identical():
    from tslib_ray.stages import sample
    df = _sketch_df(n=8000, seed=21)
    df["item"] = "i" + (df["v"] * 53).astype(int).astype(str)
    key = ["k", "bucket_ts", "item"]
    a = sample.kmv_tier(rd.from_pandas(df), "k", "ts", "item", "1h",
                        k=16, n_parts=3).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = sample.kmv_tier(rd.from_pandas(df.iloc[::-1]), "k", "ts", "item",
                        "1h", k=16, n_parts=9).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    via = sample.kmv_cascade(rd.from_pandas(a), "k", "1d", k=16,
                             n_parts=5).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    direct = sample.kmv_tier(rd.from_pandas(df), "k", "ts", "item", "1d",
                             k=16, n_parts=4).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(via, direct)


def test_kmv_estimate_exact_below_k_and_bounded_above():
    from tslib_ray.stages import sample
    rows = []
    for key, n_distinct in (("small", 30), ("big", 5000)):
        items = [f"{key}-{i}" for i in range(n_distinct)] * 2
        rows.append(pd.DataFrame({
            "k": key, "ts": pd.Timestamp("2024-01-01"), "item": items}))
    ds = rd.from_pandas(pd.concat(rows, ignore_index=True))
    sk = sample.kmv_tier(ds, "k", "ts", "item", "1d", k=256, n_parts=4)
    est = sample.kmv_estimate(sk, "k", k=256, n_parts=4).to_pandas() \
        .set_index("k")["n_distinct"]
    assert est["small"] == 30.0  # below k -> exact
    assert abs(est["big"] - 5000) / 5000 < 0.15  # ~1/sqrt(k-2) ~ 6%


def test_lag_delta_matches_pandas_and_partition_invariant():
    from tslib_ray.stages.window import lag_delta
    df = _series_df(seed=17).rename(columns={"ts": "bucket_ts"})
    df = df.drop_duplicates(["k", "bucket_ts"])  # one row per (key, bucket)
    got = lag_delta(rd.from_pandas(df), "k", "bucket_ts", "v",
                    n_parts=5).to_pandas()
    s = df.sort_values(["k", "bucket_ts"], kind="mergesort")
    delta = s.groupby("k", sort=False)["v"].diff()
    ref = s.assign(delta=delta)[delta.notna()][
        ["k", "bucket_ts", "v", "delta"]]
    key = ["k", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(got["delta"], ref["delta"], atol=1e-12)
    np.testing.assert_allclose(got["v"], ref["v"])
    b = lag_delta(rd.from_pandas(df.iloc[::-1]), "k", "bucket_ts", "v",
                  n_parts=13).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, b)


def test_ewma_terminal_matches_sequential_recurrence():
    from tslib_ray.stages.window import ewma_terminal
    df = _series_df(seed=19)
    alpha = 0.3
    got = ewma_terminal(rd.from_pandas(df), "k", "ts", "v", alpha,
                        tiebreak="eid", n_parts=6).to_pandas() \
        .set_index("k").sort_index()
    for k, g in df.groupby("k"):
        g = g.sort_values(["ts", "eid"], kind="mergesort")
        s = None
        for v in g["v"]:
            s = v if s is None else alpha * v + (1 - alpha) * s
        assert abs(got.loc[k, "ewma"] - s) < 1e-9, k
        assert got.loc[k, "n_samples"] == len(g)


def test_ewma_rejects_bad_alpha():
    from tslib_ray.stages.window import ewma_terminal
    with pytest.raises(ValueError):
        ewma_terminal(rd.from_pandas(_series_df()), "k", "ts", "v", 0.0)


def test_ngram_topk_matches_counter_reference():
    from collections import Counter
    from tslib_ray.stages.text import ngram_topk
    rng = np.random.default_rng(23)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(300)]
    docs = rd.from_pandas(pd.DataFrame({"text": texts}))
    got = ngram_topk(docs, n=2, k=10, n_parts=4).to_pandas()
    c = Counter()
    for t in texts:
        toks = t.split(" ")
        c.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(map(tuple, got[["gram", "n"]].itertuples(index=False))) == ref


def test_ngram_topk_single_token_docs_yield_nothing():
    from tslib_ray.stages.text import ngram_topk
    docs = rd.from_pandas(pd.DataFrame({"text": ["solo", "one", "word"]}))
    assert ngram_topk(docs, n=2, k=5, n_parts=2).count() == 0
