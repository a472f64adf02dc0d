"""Deterministic sampling operators for training-data pipelines: hash-based
dataset splits and a mergeable bottom-k (KMV) distinct sample sketch.

Both are md5-basis so the EXACT output is SQL-checkable via DuckDB's
``md5_number_lower`` (the same device as the SimHash / HLL stages): no
tolerance bands, no RNG state to ship — the sample IS a pure function of
the data, which is what makes it reproducible across cluster sizes,
retries, and resumed runs (the property a `random_sample()` call cannot
give a 100-TB pipeline).

- :func:`hash_split` — train/val/test assignment by thresholding the item's
  64-bit hash. Map-only (ZERO shuffles); every worker computes the same
  split for the same id, so downstream stages can re-derive membership
  without a join.
- :func:`kmv_tier` — per ``(key, tier-bucket)`` keep the ``k`` items with
  the smallest hashes over DISTINCT items (Bar-Yossef et al. 2002's KMV /
  bottom-k sketch): a uniform-without-replacement sample of the distinct
  items that is MERGEABLE (union partials, re-take bottom-k) and therefore
  composes through the tier cascade exactly like the HLL and histogram
  sketches (map-side partial bottom-k -> one shuffle -> merge); also
  yields the KMV distinct-count estimate ``(k-1) * 2^64 / h_(k)``.

Reference-parity note: tslib has no sampling layer; this is part of the
training-data surface the build plan adds on top of the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import _md5_token_hashes
from .rollup import TIER_UNIT, _add_part, _dict_encode, floor_bucket

_U64 = np.uint64
_TWO64 = float(2 ** 64)


def _hash_items(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """md5-based 64-bit hash per item, vocab-bounded: hash each UNIQUE
    string once, scatter back through the dictionary codes."""
    enc = pc.dictionary_encode(col.cast(pa.string()))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return _md5_token_hashes(uniq)[codes]


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bound on the 64-bit hash) per split, in the
    given order; the last split absorbs the remainder. Thresholds are exact
    integers (``floor(cum_fraction * 2^64)``) so the SQL mirror compares
    the same UBIGINT literals."""
    names = list(fractions)
    if not names or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, int(cum * 2 ** 64)))
    out.append((names[-1], 2 ** 64))
    return out


def hash_split(ds: "rd.Dataset", id_col: str,
               fractions: dict[str, float] | None = None) -> "rd.Dataset":
    """Append a ``split`` column assigning each row to a named split by its
    id hash — deterministic, map-only, join-free. Default 90/5/5
    train/val/test."""
    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    ths = split_thresholds(fractions)

    def fn(b: pa.Table) -> pa.Table:
        hv = _hash_items(b[id_col])
        split = np.full(hv.size, ths[-1][0], dtype=object)
        # walk thresholds high->low so the lowest matching band wins
        for name, bound in reversed(ths[:-1]):
            split[hv < _U64(bound)] = name
        return b.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def kmv_tier(ds: "rd.Dataset", key: str, ts_col: str, item_col: str,
             tier: str, k: int = 64, n_parts: int = 64) -> "rd.Dataset":
    """Bottom-k distinct sample per ``(key, tier-bucket)``: the ``k``
    distinct items with the smallest md5 hashes, as rows ``(key,
    bucket_ts, item, hv)``. Map-side partials keep each block's local
    bottom-k (so at most ``k`` rows per (key, bucket) per block enter the
    shuffle); the merge re-deduplicates items and re-takes bottom-k —
    bottom-k of a union equals bottom-k of bottom-k's, so the result is
    identical under any partitioning (tested)."""
    assert tier in TIER_UNIT, tier

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key],
                      "bucket_ts": floor_bucket(b[ts_col], tier),
                      "item": b[item_col].cast(pa.string())})
        return _bottom_k(t, key, k)

    partials = ds.select_columns([key, ts_col, item_col]).map_batches(
        partial, batch_format="pyarrow")
    return merge_kmv_partials(partials, key, k=k, n_parts=n_parts)


def _bottom_k(t: pa.Table, key: str, k: int) -> pa.Table:
    """Bottom-k rows per (key, bucket_ts) of a local table — lexsort by
    (key, bucket, hash, item), dedupe repeated items, rank-within-segment
    <= k. One vectorized pass over all groups."""
    if t.num_rows == 0:
        return pa.table({key: t[key], "bucket_ts": t["bucket_ts"],
                         "item": pa.array([], pa.string()),
                         "hv": pa.array([], pa.uint64())})
    hv = (t["hv"].to_numpy(zero_copy_only=False).astype(np.uint64)
          if "hv" in t.column_names else _hash_items(t["item"]))
    codes, uniques = _dict_encode(t[key])
    ts_us = t["bucket_ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    icodes, iuniq = _dict_encode(t["item"])
    order = np.lexsort((icodes, hv, ts_us, codes))
    c, b, h, ic = codes[order], ts_us[order], hv[order], icodes[order]
    # drop duplicate items within a (key, bucket): equal hashes sort
    # adjacent, and equal items imply equal hashes
    samegrp = (c[1:] == c[:-1]) & (b[1:] == b[:-1])
    dup = np.concatenate(([False], samegrp & (ic[1:] == ic[:-1])))
    c, b, h, ic = c[~dup], b[~dup], h[~dup], ic[~dup]
    newseg = np.concatenate(([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1])))
    seg_id = np.cumsum(newseg) - 1
    starts = np.flatnonzero(newseg)
    rank = np.arange(c.size) - starts[seg_id]
    keep = rank < k
    return pa.table({key: pc.take(uniques, pa.array(c[keep])),
                     "bucket_ts": pa.array(b[keep], type=pa.timestamp("us")),
                     "item": pc.take(iuniq, pa.array(ic[keep])),
                     "hv": pa.array(h[keep], type=pa.uint64())})


def merge_kmv_partials(partials: "rd.Dataset", key: str, k: int = 64,
                       n_parts: int = 64) -> "rd.Dataset":
    """ONE hash shuffle on the key, then per-partition re-bottom-k."""

    def merge_part(t: pa.Table) -> pa.Table:
        return _bottom_k(t.drop_columns(["_part"]), key, k)

    parted = _add_part(partials, key, n_parts)
    return parted.groupby("_part").map_groups(merge_part,
                                              batch_format="pyarrow")


def kmv_cascade(sketch: "rd.Dataset", key: str, coarser: str, k: int = 64,
                n_parts: int = 64) -> "rd.Dataset":
    """Coarsen a KMV sketch without re-reading raw data: re-floor
    ``bucket_ts`` and re-merge (bottom-k composes exactly)."""
    assert coarser in TIER_UNIT, coarser

    def rebucket(b: pa.Table) -> pa.Table:
        i = b.column_names.index("bucket_ts")
        return b.set_column(i, "bucket_ts",
                            floor_bucket(b["bucket_ts"], coarser))

    return merge_kmv_partials(
        sketch.map_batches(rebucket, batch_format="pyarrow"), key,
        k=k, n_parts=n_parts)


def kmv_estimate(sketch: "rd.Dataset", key: str, k: int = 64,
                 n_parts: int = 64) -> "rd.Dataset":
    """Distinct-count estimate per (key, bucket_ts): exact count when the
    sketch holds < k items (the sample IS the distinct set), else the KMV
    estimator ``(k-1) / (h_(k) / 2^64)`` (Bar-Yossef et al. 2002)."""

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques = _dict_encode(t[key])
        if codes.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "bucket_ts": pa.array([], pa.timestamp("us")),
                             "n_distinct": pa.array([], pa.float64())})
        ts_us = t["bucket_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        hv = t["hv"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((hv, ts_us, codes))
        c, b, h = codes[order], ts_us[order], hv[order]
        newseg = np.concatenate(([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(newseg)
        counts = np.diff(np.append(starts, c.size))
        kth = h[starts + counts - 1].astype(np.float64)  # max hash kept
        est = np.where(counts < k, counts.astype(np.float64),
                       (k - 1) / (kth / _TWO64))
        return pa.table({key: pc.take(uniques, pa.array(c[starts])),
                         "bucket_ts": pa.array(b[starts],
                                               type=pa.timestamp("us")),
                         "n_distinct": pa.array(est, type=pa.float64())})

    parted = _add_part(sketch, key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")


def _row_bottom_k(t: pa.Table, stratum_col: str, id_col: str,
                  k: int) -> pa.Table:
    """Bottom-k ROWS per stratum by (md5 hash, id) — one lexsort pass over
    every stratum in the table (ids are unique rows, so no dedup step)."""
    if t.num_rows == 0:
        return pa.table({stratum_col: t[stratum_col], id_col: t[id_col],
                         "hv": pa.array([], pa.uint64())})
    hv = (t["hv"].to_numpy(zero_copy_only=False).astype(np.uint64)
          if "hv" in t.column_names
          else _hash_items(pc.cast(t[id_col], pa.string())))
    codes, uniques = _dict_encode(t[stratum_col])
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, hv, codes))
    c, h, i = codes[order], hv[order], ids[order]
    newseg = np.concatenate(([True], c[1:] != c[:-1]))
    starts = np.flatnonzero(newseg)
    rank = np.arange(c.size) - starts[np.cumsum(newseg) - 1]
    keep = rank < k
    return pa.table({stratum_col: pc.take(uniques, pa.array(c[keep])),
                     id_col: pa.array(i[keep]),
                     "hv": pa.array(h[keep], type=pa.uint64())})


def stratified_sample(ds: "rd.Dataset", stratum_col: str, id_col: str,
                      k: int = 50, n_parts: int = 32) -> "rd.Dataset":
    """Deterministic stratified row sample: the ``k`` rows with the smallest
    md5 id-hashes per stratum. Same mergeability as the KMV sketch (bottom-k
    of a union == bottom-k of bottom-k's), so map-side partials bound the
    shuffle at ``k`` rows per stratum per block and the result is identical
    at any parallelism — and, being hash-based, it is SQL-checkable row for
    row (row_number over the same md5 ordering)."""

    def partial(b: pa.Table) -> pa.Table:
        return _row_bottom_k(b, stratum_col, id_col, k)

    partials = ds.select_columns([stratum_col, id_col]).map_batches(
        partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        return _row_bottom_k(t.drop_columns(["_part"]), stratum_col,
                             id_col, k).drop_columns(["hv"])

    parted = _add_part(partials, stratum_col, n_parts)
    return parted.groupby("_part").map_groups(merge,
                                              batch_format="pyarrow")


def kmv_set_ops(a: "rd.Dataset", b: "rd.Dataset", item_col: str,
                k: int = 4096) -> "rd.Dataset":
    """Distinct-set cardinality algebra over two streams via mergeable
    bottom-k (KMV) hash sketches: ONE row ``(n_a, n_b, n_union,
    n_intersect)``.

    Map side keeps each block's distinct bottom-k 64-bit md5 hashes (at
    most ``k`` uint64 rows per block enter the exchange — item payloads
    never move); the single-group merge re-takes bottom-k per side
    (bottom-k of a union == bottom-k of bottom-k's) and computes:

    - exact counts when a side's sketch holds < ``k`` hashes (the sketch
      IS the distinct set — the regime the SQL oracle checks bit-for-bit);
    - the KMV estimator ``(k-1) / (h_(k) / 2^64)`` beyond, with the
      intersection via the Jaccard share of the union sketch
      (|K_union ∩ A ∩ B| / k) — the standard composition (Bar-Yossef et
      al. 2002; Beyer et al. SIGMOD'07), pytest-bounded.

    All outputs are float64 for a scale-stable schema across both regimes.
    """

    def partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            hv = np.unique(_hash_items(t[item_col]))[:k]  # sorted ascending
            return pa.table({
                "hv": pa.array(hv, pa.uint64()),
                "side": pa.array(np.full(hv.size, side, dtype=np.int8)),
                "_g": pa.array(np.zeros(hv.size, dtype=np.int32))})
        return fn

    both = a.select_columns([item_col]).map_batches(
        partial(0), batch_format="pyarrow").union(
        b.select_columns([item_col]).map_batches(
            partial(1), batch_format="pyarrow"))

    def est(h: np.ndarray) -> float:
        if h.size < k:
            return float(h.size)
        return float((k - 1) / (float(h[k - 1]) / _TWO64))

    def final(t: pa.Table) -> pa.Table:
        hv = t["hv"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = t["side"].to_numpy(zero_copy_only=False)
        ha = np.unique(hv[side == 0])[:k]
        hb = np.unique(hv[side == 1])[:k]
        hu = np.unique(hv)[:k]
        n_a, n_b, n_u = est(ha), est(hb), est(hu)
        if ha.size < k and hb.size < k:
            n_i = float(np.intersect1d(ha, hb).size)
            n_u = float(np.union1d(ha, hb).size)
        else:
            in_both = np.intersect1d(np.intersect1d(hu, ha), hb).size
            n_i = (in_both / max(hu.size, 1)) * n_u
        return pa.table({"n_a": pa.array([n_a], pa.float64()),
                         "n_b": pa.array([n_b], pa.float64()),
                         "n_union": pa.array([n_u], pa.float64()),
                         "n_intersect": pa.array([n_i], pa.float64())})

    return both.groupby("_g").map_groups(
        lambda g: final(g.drop_columns(["_g"])), batch_format="pyarrow")
