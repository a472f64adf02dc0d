"""Round-5 additions: real BPE over the committed merge fixture.

The correctness contract has two independent legs:
- kernels/bpe.py provides TWO encoder shapes (greedy lowest-rank vs
  training-order sequential); the driver oracle runs one, the distributed
  stage the other, so a bug in either shape breaks the hash compare.
- this file property-tests the equivalence of those shapes on freshly
  trained merge tables, and the actor-pool stage against the sequential
  kernel.
"""

import json
import random
import string

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from tslib_ray.kernels import bpe


def _rand_corpus(rng: random.Random, n_docs: int) -> list:
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8)))
             for _ in range(30)]
    return [" ".join(rng.choices(vocab, k=rng.randint(0, 40)))
            for _ in range(n_docs)]


def test_trainer_deterministic():
    rng = random.Random(7)
    texts = _rand_corpus(rng, 50)
    assert bpe.train_merges(texts, 48) == bpe.train_merges(list(texts), 48)


def test_encoders_equivalent_on_trained_tables():
    """Greedy lowest-rank-first (engine) == training-order sequential
    (oracle) for tables produced by train_merges — across seeds, merge
    counts, and out-of-vocabulary words."""
    for seed in range(6):
        rng = random.Random(seed)
        texts = _rand_corpus(rng, 40)
        merges = bpe.train_merges(texts, rng.choice([8, 32, 96]))
        ranks = {p: i for i, p in enumerate(merges)}
        words = set()
        import re
        rx = re.compile(bpe.BPE_SPLIT_PATTERN)
        for t in texts:
            words.update(rx.findall(t))
        words.update([" zzzznever", "qq##qq", ""])  # OOV + punct + empty
        for w in sorted(words):
            assert bpe.encode_word(w, ranks) == bpe.encode_word_seq(w, merges), w


def test_encode_word_merges_all_occurrences():
    # one merge (a,b): every adjacent occurrence collapses left-to-right
    ranks = {("a", "b"): 0}
    assert bpe.encode_word("ababab", ranks) == ["ab", "ab", "ab"]
    assert bpe.encode_word("aab", ranks) == ["a", "ab"]
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z"]


def test_fixture_loads_and_is_nontrivial():
    ranks = bpe.load_ranks()
    assert len(ranks) == 64
    with open(bpe.FIXTURE_PATH) as f:
        meta = json.load(f)
    assert meta["n_merges"] == len(meta["merges"]) == 64
    # counts must differ from pretoken counts (i.e. real merging happens)
    toks = bpe.encode_word(" value", ranks)
    assert 1 <= len(toks) < len(" value")


def test_stage_matches_sequential_kernel(ray_session):
    from tslib_ray.stages.text import bpe_token_count
    rng = random.Random(99)
    texts = _rand_corpus(rng, 200) + ["", "  ", "it's 1234 #!"]
    with open(bpe.FIXTURE_PATH) as f:
        merges = [tuple(p) for p in json.load(f)["merges"]]
    want = bpe.count_tokens_seq(texts, merges)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    got = (bpe_token_count(ds, concurrency=2).to_pandas()
           .sort_values("doc_id")["n_tokens"].tolist())
    assert got == want


def test_stage_handles_nulls_and_empty_blocks(ray_session):
    from tslib_ray.stages.text import bpe_token_count
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["value row", None], type=pa.string())})
    out = bpe_token_count(rd.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("doc_id")
    assert out["n_tokens"].tolist()[1] == 0
    assert out["n_tokens"].tolist()[0] > 0


def test_interval_gate_parity_with_exchanged_plan(ray_session, monkeypatch):
    """The size-gated single-task interval resolve must be bit-identical to
    the bucket-exchanged plan (integer counts — no tolerance)."""
    from tslib_ray.stages import interval as iv
    rng = np.random.RandomState(3)
    n_pts, n_rng = 5000, 300
    base = 1_700_000_000_000_000
    pts = pa.table({"ts": pa.array(base + rng.randint(0, 10**9, n_pts),
                                   type=pa.int64())})
    lo = base + rng.randint(0, 10**9, n_rng)
    ranges = pa.table({"rid": pa.array(np.arange(n_rng), type=pa.int64()),
                       "lo": pa.array(lo, type=pa.int64()),
                       "hi": pa.array(lo + rng.randint(0, 60_000_000, n_rng),
                                      type=pa.int64())})

    def run():
        return (iv.interval_count_join(
            rd.from_arrow(pts), rd.from_arrow(ranges), "ts", "rid",
            "lo", "hi", bucket_us=60_000_000, n_parts=8)
            .to_pandas().sort_values("rid").reset_index(drop=True))

    gated = run()
    monkeypatch.setattr(iv, "SMALL_INTERVAL_ROWS", 0)
    exchanged = run()
    assert gated.equals(exchanged)
    assert len(gated) > 0


def test_hash_merge_arrow_out_matches_pandas_reference(ray_session):
    """hash_merge now emits metadata-free Arrow blocks (the pandas-block
    path re-entered Ray's from_pandas conversion, whose metadata-carrying
    schema is unhashable and defeated block-schema dedup). Values, dtypes
    and key sort-order must be exactly the pandas groupby reference."""
    from tslib_ray.stages.rollup import hash_merge
    rng = np.random.RandomState(11)
    n = 20_000
    t = pa.table({
        "i": pa.array(rng.randint(0, 50, n), type=pa.int64()),
        "j": pa.array(rng.randint(0, 30, n), type=pa.int64()),
        "val": pa.array(np.round(rng.rand(n), 2)),
        "cnt": pa.array(np.ones(n, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(8)
    out = hash_merge(ds, ["i", "j"], {"val": "sum", "cnt": "sum"})
    got = out.to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
    want = t.to_pandas().groupby(["i", "j"], as_index=False,
                                 sort=True).agg({"val": "sum",
                                                 "cnt": "sum"})
    assert got["cnt"].tolist() == want["cnt"].tolist()
    assert np.allclose(got["val"], want["val"], rtol=0, atol=1e-9)
    assert got["i"].dtype == np.int64 and got["val"].dtype == np.float64
    # schema must be metadata-free (hashable) on every output block
    import ray as _ray
    for ref in out.to_arrow_refs():
        tb = _ray.get(ref)
        assert tb.schema.metadata is None
        hash(tb.schema)  # must not raise
