"""Deduplication operators over document tables.

- :func:`dedup_exact` — content-hash + hash-partitioned first-wins
  (``groupby(hash).map_groups(head(1))`` — the only shuffle moves hashes, not
  the full text when ``key_only`` pre-projection is used upstream).
- :func:`minhash_lsh_candidates` / :func:`dedup_minhash` — shingle -> minhash
  -> banded LSH buckets -> candidate groups -> exact-Jaccard verify; the
  standard near-dup pipeline (Broder 1997; see PAPERS.md).
- :func:`dedup_simhash` — 64-bit SimHash (Charikar 2002) with bucketing on
  rotated prefixes.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification of candidate
  pairs (used as the verify stage for both LSH variants).
- :func:`dedup_embedding` — cosine near-dup over an embedding column via
  LSH-free brute force within hash buckets (see :mod:`tslib_ray.stages.ann`
  for the top-k search variant).

All hashing is seeded/deterministic; all per-batch work is vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_U64 = np.uint64
_MERSENNE = (1 << 61) - 1


def hash_bytes(b: bytes) -> int:
    """Deterministic 64-bit content hash (C-speed blake2b;
    PYTHONHASHSEED-independent — never use built-in ``hash`` in distributed
    code, it is salted per process)."""
    import hashlib
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def _token_hashes(text: str) -> np.ndarray:
    """Per-token 64-bit hashes (crc32 of token ^ crc32 of reversed token —
    two C-speed passes, vectorized combine)."""
    import zlib
    toks = text.split(" ")
    lo = np.fromiter((zlib.crc32(t.encode()) for t in toks),
                     dtype=np.uint64, count=len(toks))
    hi = np.fromiter((zlib.crc32(t[::-1].encode()) for t in toks),
                     dtype=np.uint64, count=len(toks))
    return (hi << np.uint64(32)) | lo


def _token_shingles(text: str, k: int) -> np.ndarray:
    """Unique k-token shingle hashes via a vectorized polynomial combine of
    per-token hashes (no per-shingle string joins)."""
    th = _token_hashes(text)
    if th.size < k:
        h = np.uint64(0xCBF29CE484222325)
        for x in th:
            h = h * np.uint64(0x100000001B3) ^ x
        return np.array([h], dtype=np.uint64)
    P = np.uint64(1099511628211)
    out = th[: th.size - k + 1].copy()
    for j in range(1, k):
        out = out * P ^ th[j: th.size - k + 1 + j]
    return np.unique(out)


def dedup_exact(docs: "rd.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "rd.Dataset":
    """Exact dedup: keep the minimum-id row per distinct text content.

    Hash-partition on a 64-bit content hash; the winner per group is the
    smallest id (deterministic at any parallelism). The shuffle carries
    (hash, id) plus payload columns; for 100 TB inputs project payload away
    first and re-join winners by id.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = np.fromiter(
            (hash_bytes(t.encode("utf-8")) for t in batch[text_col].to_pylist()),
            dtype=np.uint64, count=len(batch))
        return batch.append_column("content_hash", pa.array(h))

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_hash").map_groups(first,
                                                     batch_format="pandas")


class MinHasher:
    """Actor-pool stage: k-shingle minhash signatures + banded LSH keys.

    Permutation parameters are built once per actor in ``__init__`` (the
    "model load" pattern); signatures are ``(a*x + b) mod p`` universal
    hashes minimized over each doc's shingle set.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 bands: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        x = shingles.astype(np.uint64) % _U64(_MERSENNE)
        # (num_perm, n_shingles) universal hash, min over shingles
        hx = (np.multiply.outer(self.a, x) + self.b[:, None]) % _U64(_MERSENNE)
        return hx.min(axis=1)

    def _batch_signatures(self, texts: pd.Series) -> np.ndarray:
        """Vectorized signatures for a whole batch: hash every token once
        (pd.util.hash_array — deterministic siphash), combine k-grams with a
        polynomial rolling hash masked at document boundaries, then one
        segmented min (np.minimum.reduceat) per permutation. No per-document
        Python beyond the initial split."""
        tok_lists = texts.str.split(" ")
        lens = tok_lists.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate(tok_lists.to_numpy())
        th = pd.util.hash_array(flat.astype(object))
        ends = np.cumsum(lens)
        starts = ends - lens
        k = self.k
        P = _U64(1099511628211)
        S = th.size
        if S == 0:
            return np.full((len(texts), self.num_perm), _MERSENNE,
                           dtype=np.uint64)
        # rolling k-gram combine at EVERY token position (padded tail), so
        # doc d owns exactly the segment [starts[d], ends[d]) of sh
        th_pad = np.concatenate([th, np.zeros(k - 1, dtype=np.uint64)])
        sh = th_pad[:S].copy()
        for j in range(1, k):
            sh = sh * P ^ th_pad[j: j + S]
        # windows whose k tokens cross the doc's end are invalid
        doc_of = np.repeat(np.arange(lens.size), lens)
        valid = (np.arange(S) + k) <= ends[doc_of]
        # docs shorter than k: no valid window — use the whole-doc combined
        # hash at the doc's first position (rare; tiny python loop)
        for d in np.flatnonzero(lens < k):
            h = np.uint64(0xCBF29CE484222325)
            for x in th[starts[d]: ends[d]]:
                h = h * _U64(0x100000001B3) ^ x
            sh[starts[d]] = h
            valid[starts[d]] = True
        x = sh % _U64(_MERSENNE)
        sigs = np.empty((lens.size, self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            hp = (self.a[p] * x + self.b[p]) % _U64(_MERSENNE)
            hp = np.where(valid, hp, _U64(_MERSENNE))
            sigs[:, p] = np.minimum.reduceat(hp, starts)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self._batch_signatures(batch["text"])
        out = {
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.bands),
            "band": np.tile(np.arange(self.bands, dtype=np.int32),
                            len(batch)),
        }
        band_sigs = sigs.reshape(len(batch), self.bands, self.rows_per_band)
        # 64-bit mix of each band's rows
        mix = band_sigs[:, :, 0].copy()
        for r in range(1, self.rows_per_band):
            mix = mix * _U64(0x100000001B3) ^ band_sigs[:, :, r]
        out["band_hash"] = mix.reshape(-1)
        return pd.DataFrame(out)


def minhash_lsh_candidates(docs: "rd.Dataset", num_perm: int = 64,
                           shingle_k: int = 3, bands: int = 16,
                           concurrency: int = 2) -> "rd.Dataset":
    """Docs -> (band, band_hash) bucket rows -> candidate duplicate groups:
    rows ``(doc_id, dup_root)`` where dup_root is the min doc_id sharing any
    LSH bucket. One shuffle on the bucket key."""
    sig = docs.map_batches(
        MinHasher, fn_constructor_kwargs=dict(num_perm=num_perm,
                                              shingle_k=shingle_k,
                                              bands=bands),
        batch_format="pandas", concurrency=concurrency)

    # partition-level UDFs (hash-bucket the LSH key, vectorized pandas
    # groupby inside) — per-bucket map_groups would pay Python overhead per
    # LSH bucket (bands x docs of them)
    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b["_part"] = (b["band_hash"].to_numpy() % np.uint64(32)).astype(np.int32)
        return b

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
        root = g.groupby(["band", "band_hash"], sort=False)[
            "doc_id"].transform("min")
        sel = (g["doc_id"] != root).to_numpy()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy()[sel],
                             "dup_root": root.to_numpy()[sel]})

    pairs = sig.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(bucket_pairs_part, batch_format="pandas")

    def reduce_roots_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False, sort=True)["dup_root"].min()
        return out

    def part_by_doc(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id", "dup_root"]].copy()
        b["_part"] = (b["doc_id"].to_numpy() % 32).astype(np.int32)
        return b

    return pairs.map_batches(part_by_doc, batch_format="pandas") \
        .groupby("_part").map_groups(
            lambda g: reduce_roots_part(g.drop(columns=["_part"])),
            batch_format="pandas")


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(map(int, _token_shingles(text_a, k)))
    sb = set(map(int, _token_shingles(text_b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def dedup_minhash(docs: "rd.Dataset", threshold: float = 0.8,
                  num_perm: int = 64, shingle_k: int = 3, bands: int = 16,
                  concurrency: int = 2) -> "rd.Dataset":
    """Near-dup removal: drop docs whose verified Jaccard to their LSH root
    is >= threshold. The text lookup for verification broadcasts only
    candidate texts (small side) via a pandas join inside ``map_groups``."""
    cands = minhash_lsh_candidates(docs, num_perm=num_perm,
                                   shingle_k=shingle_k, bands=bands,
                                   concurrency=concurrency)
    cand_df = cands.to_pandas()
    if len(cand_df) == 0:
        return docs
    need_ids = set(cand_df["doc_id"]) | set(cand_df["dup_root"])

    texts = docs.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"],
                                    value_set=pa.array(sorted(need_ids)))),
        batch_format="pyarrow").select_columns(["doc_id", "text"]).to_pandas()
    tmap = dict(zip(texts["doc_id"], texts["text"]))
    drop = {
        int(r.doc_id)
        for r in cand_df.itertuples()
        if jaccard(tmap[int(r.doc_id)], tmap[int(r.dup_root)], shingle_k)
        >= threshold
    }
    drop_arr = pa.array(sorted(drop), type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch["doc_id"],
                                               value_set=drop_arr)))

    return docs.map_batches(keep, batch_format="pyarrow")


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over token hashes."""

    def __init__(self, seed: int = 11):
        self.seed = np.uint64(seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def simhash(text: str) -> int:
            hs = _token_hashes(text)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & _U64(1))
            counts = bits.astype(np.int64).sum(axis=0)
            vote = (counts * 2) > len(hs)
            return int(np.packbits(vote[::-1]).view(">u8")[0])

        batch["simhash"] = batch["text"].map(simhash).astype(np.uint64)
        return batch


def dedup_simhash(docs: "rd.Dataset", max_hamming: int = 3,
                  concurrency: int = 2) -> "rd.Dataset":
    """SimHash near-dup candidates by 16-bit band bucketing (4 bands; two
    sigs within hamming<=3 must share a band), verified by exact hamming."""
    sigs = docs.map_batches(SimHasher, batch_format="pandas",
                            concurrency=concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy(dtype=np.uint64)
        out = []
        for band in range(4):
            out.append(pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": sh,
                "band": band,
                "band_key": (sh >> _U64(band * 16)) & _U64(0xFFFF),
            }))
        return pd.concat(out)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b["_part"] = (b["band_key"].to_numpy(dtype=np.uint64)
                      % np.uint64(32)).astype(np.int32)
        return b

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across all buckets in the partition: compare each
        # member to its bucket's min-id root by XOR popcount
        g = g.sort_values(["band", "band_key", "doc_id"], kind="mergesort")
        grp = g.groupby(["band", "band_key"], sort=False)
        root_id = grp["doc_id"].transform("first").to_numpy()
        root_sim = grp["simhash"].transform("first").to_numpy(dtype=np.uint64)
        sh = g["simhash"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy()
        x = sh ^ root_sim
        # SWAR popcount
        x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
        x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
        x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
        ham = ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)
        sel = (ids != root_id) & (ham <= max_hamming)
        return pd.DataFrame({"doc_id": ids[sel], "dup_root": root_id[sel]})

    pairs = exploded.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(verify_part, batch_format="pandas")

    def part_by_doc(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id", "dup_root"]].copy()
        b["_part"] = (b["doc_id"].to_numpy() % 32).astype(np.int32)
        return b

    return pairs.map_batches(part_by_doc, batch_format="pandas") \
        .groupby("_part").map_groups(
            lambda g: g.drop(columns=["_part"]).groupby(
                "doc_id", as_index=False, sort=True)["dup_root"].min(),
            batch_format="pandas")
