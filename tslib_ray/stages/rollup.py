"""Bucketed rollup aggregates with partial/final (combiner) execution, tier
cascade, and retention trim.

Design for 100 TB (SURVEY.md §4.3):

- **Phase 1 (map side, no shuffle)**: every input block is collapsed to at
  most one partial row per ``(key, bucket)`` via ``pyarrow.Table.group_by`` —
  count/sum/min/max compose, mean is derived as sum/count at the end. After
  this, the shuffle moves *partials*, not rows: a conversation with 10^6
  turns in a block contributes one row per bucket, which is also the skew
  story — hot keys are pre-collapsed before they hit the exchange (an
  explicit salt column is unnecessary because the map-side combine already
  bounds per-key fan-in to #blocks).
- **Phase 2 (one hash shuffle)**: ``groupby(keys + bucket)`` merging partials
  with sum/sum/min/max/sum-of-count.
- **Tier cascade**: 1m -> 1h -> 1d re-aggregates the (small) coarser tier's
  partial columns, never the raw input (partials compose exactly).

The reference has no rollup operator — its closest analogues are the
min/max/mean aggregations in ``/root/reference/tests/testScriptSingleTimeseries.py:105-110``
and the masked means of ``src/algorithms/alsWrapper.py:98-99``; the rollup
itself is the engine's north-star graft.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

TIER_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}
TIERS = ("1m", "1h", "1d")


def floor_bucket(ts: pa.ChunkedArray | pa.Array, tier: str) -> pa.ChunkedArray:
    """``floor_temporal`` to the tier's unit (1m/1h/1d)."""
    return pc.floor_temporal(ts, unit=TIER_UNIT[tier])


def _partial_batch(batch: pa.Table, keys: list[str], ts_col: str,
                   value_col: str, tier: str) -> pa.Table:
    """Map-side combine: one partial row per (keys..., bucket_ts) per batch."""
    batch = batch.append_column("bucket_ts", floor_bucket(batch[ts_col], tier))
    gb = batch.group_by(keys + ["bucket_ts"])
    out = gb.aggregate([
        (value_col, "sum"),
        (value_col, "min"),
        (value_col, "max"),
        (value_col, "count"),
    ])
    return out.rename_columns(
        keys + ["bucket_ts", "sum_value", "min_value", "max_value", "n"])


def _finalize(batch: pa.Table) -> pa.Table:
    """mean := sum/count, computed once at the end (FIXTURES.md F6: mean is
    sum/count, never an incremental mean)."""
    mean = pc.divide(batch["sum_value"], pc.cast(batch["n"], pa.float64()))
    return batch.append_column("mean_value", mean)


def rollup(ds: "rd.Dataset", keys: Sequence[str], ts_col: str, value_col: str,
           tier: str = "1m") -> "rd.Dataset":
    """Tier points ``(keys..., bucket_ts, n, sum/min/max/mean_value)`` for one
    tier, via map-side partials + one hash shuffle."""
    keys = list(keys)
    partial = ds.map_batches(
        lambda b: _partial_batch(b, keys, ts_col, value_col, tier),
        batch_format="pyarrow")
    merged = partial.groupby(keys + ["bucket_ts"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
        Sum("n", alias_name="n"),
    )
    return merged.map_batches(_finalize, batch_format="pyarrow")


def cascade(tier_points: "rd.Dataset", keys: Sequence[str],
            coarser_tier: str) -> "rd.Dataset":
    """Roll a finer tier's points up to a coarser tier by re-aggregating the
    partial columns (sum of sums, min of mins, max of maxes, sum of counts) —
    the raw input is never touched again."""
    keys = list(keys)

    def rebucket(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["mean_value"]) if "mean_value" in b.column_names else b
        b = b.set_column(b.column_names.index("bucket_ts"), "bucket_ts",
                         floor_bucket(b["bucket_ts"], coarser_tier))
        gb = b.group_by(keys + ["bucket_ts"])
        out = gb.aggregate([("sum_value", "sum"), ("min_value", "min"),
                            ("max_value", "max"), ("n", "sum")])
        return out.rename_columns(
            keys + ["bucket_ts", "sum_value", "min_value", "max_value", "n"])

    partial = tier_points.map_batches(rebucket, batch_format="pyarrow")
    merged = partial.groupby(keys + ["bucket_ts"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
        Sum("n", alias_name="n"),
    )
    return merged.map_batches(_finalize, batch_format="pyarrow")


def rate_by(ds: "rd.Dataset", dim_col: str, ts_col: str,
            tier: str = "1h") -> "rd.Dataset":
    """Per-(dimension, bucket) turn counts (role / tool turn rates of the
    north star). Same partial+final structure, count-only payload."""

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("bucket_ts", floor_bucket(b[ts_col], tier))
        out = b.group_by([dim_col, "bucket_ts"]).aggregate([(dim_col, "count")])
        return out.rename_columns([dim_col, "bucket_ts", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return p.groupby([dim_col, "bucket_ts"]).aggregate(
        Sum("n", alias_name="n"))


def retention_trim(tier_points: "rd.Dataset", keys: Sequence[str],
                   keep_last: int) -> "rd.Dataset":
    """Per-key retention: keep only the most recent ``keep_last`` buckets of
    each key (per-key top-k by bucket_ts = groupby + in-UDF sort/limit;
    there is no global sort)."""
    keys = list(keys)

    def trim(g):
        g = g.sort_values("bucket_ts", kind="mergesort")
        return g.iloc[-keep_last:]

    return tier_points.groupby(keys).map_groups(trim, batch_format="pandas")
