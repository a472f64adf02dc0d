"""Distributed interval (range) join: count points falling inside
half-open time ranges, where ranges and points come from (possibly) the
same large table and share NO equi-key.

Ray-Data-first plan (the classic bucket-replication design):

1. pick a bucket width >= the maximum range span, so every range overlaps
   at most 2 buckets;
2. replicate each range row to each bucket it overlaps (bounded 2x
   fan-out), clipping nothing — the range keeps its exact [lo, hi) bounds;
3. key points by their single bucket;
4. ONE hash shuffle co-partitions both sides by bucket; inside each
   partition every (range, bucket) replica counts its points with two
   vectorized ``np.searchsorted`` calls over the partition's points sorted
   by a composite (bucket, within-bucket-offset) int64 key;
5. a final tiny ``groupby(range_id).sum`` adds the <=2 replica partials.

Scale notes: the shuffle moves ``points + 2 x ranges`` narrow rows once;
no side is ever materialized on the driver; skew is bounded by bucket
population (time-bucketed event streams are near-uniform; a hot bucket can
be split by salting the point side and replicating range replicas per
salt). The within-partition sort key packs (dense_bucket_code << 32) |
offset_us: bucket ids are re-coded to dense 0..U-1 integers INSIDE each
partition (U <= partition rows, so the code always fits 31 bits — the
raw ``ts // bucket_us`` index does NOT once ``bucket_us`` drops below
~8e5 us on epoch-microsecond data, ADVICE r03 #2), and the offset fits 32
bits because ``bucket_us < 2**32`` (~71 min) — asserted. Negative
(pre-1970) timestamps floor-divide correctly and dense codes carry
negative bucket ids without any bit tricks.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd

from .rollup import _add_part

SMALL_INTERVAL_ROWS = 2_000_000  # tagged narrow rows below which the
# co-partition resolves in one task (~80 MB of 5x int64 columns); above,
# the bucket-keyed exchange runs unchanged


def _epoch_us(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Epoch-us int64 from either a timestamp (any unit) or an int column."""
    if pa.types.is_temporal(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy()


def _composite(bucket_code: np.ndarray, offset_us: np.ndarray) -> np.ndarray:
    """Pack a DENSE partition-local bucket code (< 2**31 by construction)
    with a within-bucket offset (< 2**32 by the bucket_us assert)."""
    return (bucket_code.astype(np.int64) << np.int64(32)) | \
        offset_us.astype(np.int64)


def interval_count_join(points: "rd.Dataset", ranges: "rd.Dataset",
                        point_ts: str, range_id: str, lo_col: str,
                        hi_col: str, bucket_us: int, n_parts: int = 64,
                        out_count: str = "n") -> "rd.Dataset":
    """Per-range counts ``(range_id, n)`` of points with
    ``lo <= ts < hi``. Every range must satisfy ``hi - lo <= bucket_us``
    (checked per batch); ``bucket_us < 2**32``.

    Both inputs are union-tagged so the co-partition is ONE shuffle over
    the concatenated narrow stream (the same trick DuckDB's IEJoin and
    classic MapReduce range joins use; public design, e.g. Chawda et al.,
    "Processing Interval Joins on Map-Reduce", EDBT'14).
    """
    assert 0 < bucket_us < 2 ** 32
    import ray.data as rd  # noqa: F401

    def tag_points(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b[point_ts])
        bucket = ts // bucket_us
        return pa.table({
            "_bucket": pa.array(bucket),
            "_off": pa.array(ts - bucket * bucket_us),
            "_rid": pa.array(np.full(len(b), -1, dtype=np.int64)),
            "_lo": pa.array(np.zeros(len(b), dtype=np.int64)),
            "_hi": pa.array(np.zeros(len(b), dtype=np.int64)),
        })

    def tag_ranges(b: pa.Table) -> pa.Table:
        lo = _epoch_us(b[lo_col])
        hi = _epoch_us(b[hi_col])
        if np.any(hi - lo > bucket_us):
            raise ValueError("range span exceeds bucket width")
        rid = b[range_id].cast(pa.int64()).to_numpy()
        b_lo, b_hi = lo // bucket_us, np.maximum(hi - 1, lo) // bucket_us
        # replica per overlapped bucket (1 or 2 by the span precondition)
        two = b_hi > b_lo
        bucket = np.concatenate([b_lo, b_hi[two]])
        rid_r = np.concatenate([rid, rid[two]])
        lo_r = np.concatenate([lo, lo[two]])
        hi_r = np.concatenate([hi, hi[two]])
        return pa.table({
            "_bucket": pa.array(bucket),
            "_off": pa.array(np.zeros(bucket.size, dtype=np.int64)),
            "_rid": pa.array(rid_r),
            "_lo": pa.array(lo_r),
            "_hi": pa.array(hi_r),
        })

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        ranges.map_batches(tag_ranges, batch_format="pyarrow"))

    def count_part(t: pa.Table) -> pa.Table:
        rid = t["_rid"].to_numpy()
        is_range = rid >= 0
        if not is_range.any():
            return pa.table({range_id: pa.array([], type=pa.int64()),
                             out_count: pa.array([], type=pa.int64())})
        all_bucket = t["_bucket"].to_numpy()
        # dense partition-local bucket codes: always < 2**31 (<= row count),
        # so the composite pack is exact for ANY bucket_us / epoch / sign
        uniq = np.unique(all_bucket)
        code = np.searchsorted(uniq, all_bucket)
        off = t["_off"].to_numpy()
        pkey = np.sort(_composite(code[~is_range], off[~is_range]))
        bucket = all_bucket[is_range]
        rcode = code[is_range]
        lo = t["_lo"].to_numpy()[is_range]
        hi = t["_hi"].to_numpy()[is_range]
        # clip each replica's bounds to ITS bucket so the two replicas of a
        # straddling range partition the interval exactly
        b0 = bucket * bucket_us
        lo_c = np.maximum(lo, b0) - b0
        hi_c = np.minimum(hi, b0 + bucket_us) - b0
        n = (np.searchsorted(pkey, _composite(rcode, hi_c), side="left")
             - np.searchsorted(pkey, _composite(rcode, lo_c), side="left"))
        n = np.maximum(n, 0)  # degenerate hi <= lo ranges count zero
        return pa.table({range_id: pa.array(rid[is_range]),
                         out_count: pa.array(n.astype(np.int64))})

    # ---- size-gated single-task resolve (the SMALL_MEMBERSHIP_ROWS /
    # _small_cc_task gate family): below the gate the tagged stream is a
    # few MB of narrow int64 rows and the bucket exchange + final Sum
    # exchange are pure fixed cost. count_part() is partition-oblivious
    # (dense codes are recomputed over whatever rows it sees) and the
    # replica merge is an INTEGER sum, so the single-task result is
    # bit-identical to the exchanged plan by construction.
    import ray as _ray
    tagged_mat = tagged.materialize()
    if tagged_mat.count() <= SMALL_INTERVAL_ROWS:

        @_ray.remote
        def resolve(refs) -> pa.Table:
            ts = [t for t in _ray.get(list(refs)) if t.num_rows]
            if not ts:
                return pa.table({range_id: pa.array([], type=pa.int64()),
                                 out_count: pa.array([], type=pa.int64())})
            part = count_part(pa.concat_tables(ts))
            rid = part[range_id].to_numpy()
            n = part[out_count].to_numpy()
            uniq, inv = np.unique(rid, return_inverse=True)
            tot = np.bincount(inv, weights=n).astype(np.int64)
            return pa.table({range_id: pa.array(uniq),
                             out_count: pa.array(tot)})

        anchor = pa.table({range_id: pa.array([], type=pa.int64()),
                           out_count: pa.array([], type=pa.int64())})
        ref = resolve.remote(tagged_mat.to_arrow_refs())
        return rd.from_arrow(anchor).union(rd.from_arrow_refs([ref]))

    parted = _add_part(tagged_mat, "_bucket", n_parts)
    partials = parted.groupby("_part").map_groups(
        lambda t: count_part(t.drop_columns(["_part"])),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum
    merged = partials.groupby(range_id).aggregate(
        Sum(out_count, alias_name=out_count))
    return merged
