"""Mergeable histogram quantile sketch — the cascade-compatible percentile
path that :func:`tslib_ray.stages.rollup.quantiles_per_key` (exact, but
non-composable) cannot provide.

Representation: per ``(key, bucket_ts)`` a fixed equi-width histogram over
``[lo, hi)`` with ``n_bins`` bins (underflow clamps into bin 0, overflow
into bin ``n_bins-1``), stored LONG — one ``(key, bucket_ts, bin, n)`` row
per non-empty bin. Long rows are composable partials under plain ``sum``:

- map side collapses each input block with ``pyarrow.Table.group_by`` (hot
  keys pre-bounded exactly like the rollup partials — the skew story is
  inherited, no salt needed);
- ONE hash shuffle merges partials per ``(key, bucket, bin)``;
- the tier cascade (1m -> 1h -> 1d) re-buckets ``bucket_ts`` and re-merges
  the SAME rows — bin counts add, so the cascaded sketch is bit-identical
  to sketching the coarser tier directly (tested);
- quantile estimates interpolate inside the covering bin; the absolute
  error is bounded by the bin width ``(hi - lo) / n_bins`` for in-range
  data (tested).

The sketch is deliberately exact-checkable: bin assignment is integer
arithmetic, so a DuckDB mirror (LEAST/GREATEST/FLOOR) reproduces the rows
bit-for-bit — unlike t-digest-style sketches whose centroids depend on
merge order. For long-tailed values pick ``lo``/``hi`` from a prior
min/max aggregate (one cheap pass) or log-transform upstream.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .rollup import TIER_UNIT, _add_part, floor_bucket


def _bin_index(values: pa.ChunkedArray | pa.Array, lo: float, hi: float,
               n_bins: int) -> pa.ChunkedArray:
    """Clamped equi-width bin index, pure Arrow integer/float kernels."""
    w = (hi - lo) / n_bins
    raw = pc.floor(pc.divide(pc.subtract(values, pa.scalar(float(lo))),
                             pa.scalar(float(w))))
    clamped = pc.max_element_wise(
        pc.min_element_wise(raw, pa.scalar(float(n_bins - 1))),
        pa.scalar(0.0))
    return pc.cast(clamped, pa.int32())


def histogram_tier(ds: "rd.Dataset", key: str, ts_col: str, value_col: str,
                   tier: str, lo: float, hi: float, n_bins: int = 64,
                   n_parts: int = 64) -> "rd.Dataset":
    """Per-(key, tier-bucket) histogram sketch rows ``(key, bucket_ts, bin,
    n)`` — map-side partials, one hash shuffle, vectorized merge."""

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("bucket_ts", floor_bucket(b[ts_col], tier))
        b = b.append_column("bin", _bin_index(b[value_col], lo, hi, n_bins))
        out = b.group_by([key, "bucket_ts", "bin"]).aggregate(
            [(value_col, "count")])
        return out.rename_columns([key, "bucket_ts", "bin", "n"])

    partials = ds.select_columns([key, ts_col, value_col]).map_batches(
        partial, batch_format="pyarrow")
    return merge_histogram_partials(partials, key, n_parts=n_parts)


def merge_histogram_partials(partials: "rd.Dataset", key: str,
                             n_parts: int = 64) -> "rd.Dataset":
    """Sum partial rows per (key, bucket_ts, bin): one stable hash-bucket
    shuffle on the key, then a C-speed group_by per partition."""

    def merge_part(t: pa.Table) -> pa.Table:
        out = t.drop_columns(["_part"]).group_by(
            [key, "bucket_ts", "bin"]).aggregate([("n", "sum")])
        return out.rename_columns([key, "bucket_ts", "bin", "n"])

    parted = _add_part(partials, key, n_parts)
    return parted.groupby("_part").map_groups(merge_part,
                                              batch_format="pyarrow")


def histogram_cascade(sketch: "rd.Dataset", key: str, coarser: str,
                      n_parts: int = 64) -> "rd.Dataset":
    """Coarsen a sketch to a coarser tier WITHOUT touching raw data: re-floor
    ``bucket_ts`` and re-merge — bin counts compose exactly, so the result
    is bit-identical to sketching the coarser tier from raw (tested)."""
    assert coarser in TIER_UNIT, coarser

    def rebucket(b: pa.Table) -> pa.Table:
        i = b.column_names.index("bucket_ts")
        return b.set_column(i, "bucket_ts",
                            floor_bucket(b["bucket_ts"], coarser))

    return merge_histogram_partials(
        sketch.map_batches(rebucket, batch_format="pyarrow"), key,
        n_parts=n_parts)


def quantiles_from_histogram(sketch: "rd.Dataset", key: str, lo: float,
                             hi: float, n_bins: int,
                             qs: Sequence[float] = (0.5, 0.95, 0.99),
                             names: Sequence[str] | None = None,
                             n_parts: int = 64) -> "rd.Dataset":
    """Estimate quantiles from sketch rows: per (key, bucket_ts), walk the
    bin CDF and interpolate inside the covering bin — all groups of a
    partition in one lexsort + searchsorted pass. |estimate - exact| <=
    bin width for data inside [lo, hi)."""
    import pandas as pd  # noqa: F401  (map_groups pandas fallback types)

    names = list(names or [f"p{round(q * 100)}" for q in qs])
    w = (hi - lo) / n_bins
    qs = np.asarray(qs, dtype=np.float64)

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        from .rollup import _dict_encode
        codes, uniques = _dict_encode(t[key])
        ts_us = t["bucket_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        bins = t["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if codes.size == 0:
            cols = {key: uniques.take(pa.array([], type=pa.int64())),
                    "bucket_ts": pa.array([], type=pa.timestamp("us"))}
            for nm in names:
                cols[nm] = pa.array([], type=pa.float64())
            return pa.table(cols)
        order = np.lexsort((bins, ts_us, codes))
        c, b, bins, n = codes[order], ts_us[order], bins[order], n[order]
        newseg = np.concatenate(
            ([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1])))
        seg = np.cumsum(newseg) - 1
        starts = np.flatnonzero(newseg)
        ends = np.append(starts[1:], c.size)
        cum = np.cumsum(n)
        seg_base = np.concatenate(([0], cum[ends[:-1] - 1]))
        cum_in = cum - seg_base[seg]          # within-group CDF at each row
        totals = cum_in[ends - 1]
        cols = {key: pc.take(uniques, pa.array(c[starts])),
                "bucket_ts": pa.array(b[starts], type=pa.timestamp("us"))}
        for q, nm in zip(qs, names):
            target = q * totals[seg]          # rank target, broadcast to rows
            # first row of each group whose cum_in >= target: mark and reduce
            hit = cum_in >= target
            # index of first hit per group, vectorized: among hit rows take
            # the minimum row index per segment
            idx_rows = np.where(hit, np.arange(c.size), c.size)
            first_hit = np.minimum.reduceat(idx_rows, starts)
            first_hit = np.minimum(first_hit, ends - 1)  # all-zero guard
            bin_q = bins[first_hit]
            n_q = n[first_hit]
            cum_before = cum_in[first_hit] - n_q
            tgt = q * totals
            frac = np.where(n_q > 0, (tgt - cum_before) / n_q, 0.0)
            frac = np.clip(frac, 0.0, 1.0)
            cols[nm] = pa.array(lo + (bin_q + frac) * w, type=pa.float64())
        return pa.table(cols)

    parted = _add_part(sketch, key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")
