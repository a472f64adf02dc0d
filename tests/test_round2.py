"""Round-2 operator tests: capped cosine blocking, exact all-pairs dedup,
distributed matmul (+fused transposes), pair generation, partition-level
gap-fill equivalence, vectorized SimHash/fingerprint kernels."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tslib_ray.stages.ann import cosine_dedup, cosine_pairs_exact
from tslib_ray.stages.dedup import _bucket_pairs, jaccard
from tslib_ray.stages import matrix as MX


def _emb_ds(n, d=16, n_dups=20, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    # plant near-dups: copy earlier vectors with tiny noise
    src = rng.integers(0, n - n_dups, size=n_dups)
    base[n - n_dups:] = base[src] + 1e-4 * rng.normal(size=(n_dups, d))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(base.astype(np.float64)),
    }), src


def test_cosine_exact_finds_planted_dups():
    df, src = _emb_ds(300)
    out = cosine_pairs_exact(rd.from_pandas(df), threshold=0.99).to_pandas()
    got = dict(zip(out["vec_id"], out["dup_root"]))
    for i, s in enumerate(src):
        assert got.get(280 + i) == s  # planted copy points at its source


def test_cosine_dedup_hot_bucket_bounded():
    # one hot centroid: every vector nearly identical -> all land in one
    # centroid bucket; with max_bucket the task never does all-pairs over
    # the full group (bounded memory), at a documented recall cost
    rng = np.random.default_rng(1)
    n = 5000
    base = rng.normal(size=16)
    m = base + 1e-3 * rng.normal(size=(n, 16))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(m.astype(np.float64))})
    out = cosine_dedup(rd.from_pandas(df), threshold=0.999,
                       max_bucket=512).to_pandas()
    # sub-bucketed: plenty of pairs found, memory bounded by 512^2 per block
    assert len(out) > 0
    assert (out["dup_root"] < out["vec_id"]).all()


def test_bucket_pairs_smallest_mates():
    ids = np.array([1, 5, 9, 12, 3, 7], dtype=np.int64)
    codes = np.array([0, 0, 0, 0, 1, 1])
    d, c = _bucket_pairs(ids, codes, max_mates=2)
    pairs = set(zip(d.tolist(), c.tolist()))
    # bucket 0 (ids 1,5,9,12): each pairs with its 2 smallest predecessors
    assert pairs == {(5, 1), (9, 1), (9, 5), (12, 1), (12, 5), (7, 3)}


def test_matmul_both_sides_distributed():
    rng = np.random.default_rng(2)
    An = np.round(rng.normal(size=(23, 17)), 2)
    Bn = np.round(rng.normal(size=(17, 11)), 2)

    def to_df(M):
        i, j = np.nonzero(M)
        return pd.DataFrame({"i": i.astype(np.int64),
                             "j": j.astype(np.int64), "val": M[i, j]})

    got = MX.matmul(rd.from_pandas(to_df(An)), rd.from_pandas(to_df(Bn)),
                    n_parts=5).to_pandas()
    G = np.zeros((23, 11))
    G[got["i"], got["j"]] = got["val"]
    np.testing.assert_allclose(G, An @ Bn, atol=1e-9)

    got_t = MX.matmul(rd.from_pandas(to_df(An)), rd.from_pandas(to_df(An)),
                      b_transpose=True, n_parts=5).to_pandas()
    Gt = np.zeros((23, 23))
    Gt[got_t["i"], got_t["j"]] = got_t["val"]
    np.testing.assert_allclose(Gt, An @ An.T, atol=1e-9)


def test_gapfill_partition_matches_per_key(sf_small):
    """The vectorized global-interp path must equal per-key np.interp."""
    from tslib_ray.kernels.tsutils import nan_interpolate
    import __ray_entry__ as entrypoint
    df = entrypoint.queries()["gap_fill_linear"](sf_small).to_pandas()
    rng = np.random.default_rng(0)
    for uid in rng.choice(df["user_id"].unique(), 5, replace=False):
        g = df[df["user_id"] == uid].sort_values("bucket_ts")
        v = g["mean_value"].to_numpy().copy()
        obs = g["observed"].to_numpy()
        masked = np.where(obs, v, np.nan)
        ref = nan_interpolate(masked)
        ref = np.floor(ref * 1e6 + 0.5) / 1e6
        np.testing.assert_array_equal(v, ref)


def test_simhash_vectorized_matches_scalar():
    import hashlib
    from tslib_ray.stages.dedup import SimHasher
    texts = ["the quick brown fox", "the quick brown fox",
             "lorem ipsum dolor sit amet", "a b a b a"]
    out = SimHasher()(pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                                    "text": texts}))

    def scalar_simhash(text):
        toks = text.split(" ")
        counts = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                               "little")
            for b in range(64):
                counts[b] += (h >> b) & 1
        sim = 0
        for b in range(64):
            if counts[b] * 2 > len(toks):
                sim |= 1 << b
        return np.uint64(sim)

    for i, t in enumerate(texts):
        assert out["simhash"].iloc[i] == scalar_simhash(t), t
    assert out["simhash"].iloc[0] == out["simhash"].iloc[1]


def test_jaccard_shingle_helper():
    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("a b c d", "x y z w") == 0.0


def test_panel_from_csv_rsc(tmp_path):
    """Reference case-study ingestion shape: CSV rows -> filter -> long
    panel -> RSC counterfactual (testScriptSynthControlSVD.py:29-30,106-108
    re-expressed streaming)."""
    from tslib_ray.sources.panel import panel_from_csv, synth_panel
    from tslib_ray.stages.panel import rsc_counterfactuals

    panel, truth = synth_panel(n_experiments=1, seed=7)
    csv = panel.rename(columns={"unit": "region", "t": "year",
                                "value": "gdpcap"})
    csv["measure"] = "GDP"          # plus a decoy measure to filter out
    decoy = csv.copy(); decoy["measure"] = "Noise"; decoy["gdpcap"] = -1.0
    path = tmp_path / "panel.csv"
    pd.concat([csv, decoy]).to_csv(path, index=False)

    ds = panel_from_csv(str(path), "region", "year", "gdpcap",
                        filter_col="measure", filter_value="GDP")
    out = rsc_counterfactuals(ds, "treated", 4, train_end=30).to_pandas()
    t_post, cf_true = truth[("e0", "m0")]
    assert len(out) == len(t_post)
    # counterfactual tracks the known pre-effect mean (planted effect = 1.5)
    err = np.abs(out.sort_values("t")["counterfactual"].to_numpy() - cf_true)
    assert err.mean() < 0.5


def test_synth_documents_deterministic_and_planted():
    from tslib_ray.sources.documents import synth_documents
    a = synth_documents(2000, parallelism=1).to_pandas()
    b = synth_documents(2000, parallelism=7).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # byte-identical at any parallelism
    # planted near-dups: a visible fraction is near-identical to an earlier doc
    from tslib_ray.stages.dedup import jaccard
    import numpy as np
    dup_like = 0
    for i in range(1900, 2000):
        t = a["text"].iloc[i]
        best = max(jaccard(t, a["text"].iloc[j]) for j in range(0, 200))
        dup_like += best > 0.8
    assert dup_like >= 1  # tail samples include planted copies of early docs


def test_ivf_recall_at_partial_probe():
    """IVF with n_probe < n_centroids keeps high recall on clustered data
    (the scale path's contract; exact equality at full probe is SQL-checked
    by the driver)."""
    from tslib_ray.stages.ann import knn_brute, knn_ivf
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(8, 32)) * 4
    assign = rng.integers(0, 8, size=2000)
    m = centers[assign] + rng.normal(size=(2000, 32))
    df = pd.DataFrame({"vec_id": np.arange(2000, dtype=np.int64),
                       "embedding": list(m.astype(np.float64))})
    ds = rd.from_pandas(df)
    q = m[7][None, :]
    brute = knn_brute(ds, q, k=10)["vec_id"].tolist()
    ivf = knn_ivf(ds, q, k=10, n_centroids=16, n_probe=4)["vec_id"].tolist()
    recall = len(set(brute) & set(ivf)) / 10
    assert recall >= 0.9, recall


def test_ngram_exact_equals_minhash_on_synthetic():
    """The exact all-pairs Jaccard dedup and the 32x2 LSH path must agree
    (LSH miss probability ~1e-15 at the planted similarity levels) —
    cross-validates the LSH recall claim."""
    from tslib_ray.sources.documents import synth_documents
    from tslib_ray.stages.dedup import dedup_minhash_ids, ngram_jaccard_dedup_ids
    docs = synth_documents(3000)
    a = ngram_jaccard_dedup_ids(docs).to_pandas()["doc_id"].tolist()
    b = dedup_minhash_ids(docs).to_pandas()["doc_id"].tolist()
    assert sorted(a) == sorted(b)


def test_dedup_exact_full_rows(sf_small):
    """Full-row variant (join-based payload recovery) agrees with the
    ids-only narrow path."""
    from tslib_ray.stages.dedup import dedup_exact, dedup_exact_ids
    docs = rd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "text"])
    full = dedup_exact(docs).to_pandas().sort_values("doc_id")
    ids = dedup_exact_ids(docs).to_pandas().sort_values("doc_id")
    assert full["doc_id"].tolist() == ids["doc_id"].tolist()
    assert set(full.columns) == {"doc_id", "text"}
