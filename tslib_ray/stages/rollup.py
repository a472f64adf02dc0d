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
from ray.data.aggregate import Sum

TIER_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}
TIERS = ("1m", "1h", "1d")


def floor_bucket(ts: pa.ChunkedArray | pa.Array, tier: str) -> pa.ChunkedArray:
    """``floor_temporal`` to the tier's unit (1m/1h/1d), kept at µs precision
    (floor_temporal downcasts the unit, which breaks schema comparisons)."""
    return pc.cast(pc.floor_temporal(ts, unit=TIER_UNIT[tier]),
                   pa.timestamp("us"))


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


def hash_merge(ds: "rd.Dataset", keys: Sequence[str], agg: dict,
               n_parts: int = 32) -> "rd.Dataset":
    """Partition-level grouped aggregate: ONE int hash-bucket shuffle, then a
    vectorized pandas groupby per partition. Drop-in replacement for
    ``groupby(keys).aggregate(...)`` whenever (a) the merged values are exact
    (ints / grid-decimal sums) or order-insensitive, and (b) key cardinality
    is far above ``n_parts``. Rationale: Ray's multi-key sort aggregate pays
    ~8 s FIXED cost at 32 CPUs even on 4k rows (measured), vs ~0.3 s for the
    single-int-key partition shuffle."""
    import numpy as np
    import pandas as pd

    keys = list(keys)

    def add_part(b: pa.Table) -> pa.Table:
        # defensive strip: a pandas-block upstream reaches here via Ray's
        # from_pandas conversion, whose metadata-carrying schema is
        # unhashable (see merge below) — make hash_merge clean regardless
        # of the producer's block format
        b = b.replace_schema_metadata(None)
        h = np.zeros(len(b), dtype=np.uint64)
        P = np.uint64(1099511628211)
        for k in keys:
            h = h * P ^ pd.util.hash_array(b[k].to_pandas().to_numpy())
        return b.append_column("_part",
                               pa.array((h % n_parts).astype(np.int32)))

    def merge(g: pd.DataFrame) -> pa.Table:
        out = g.drop(columns=["_part"]).groupby(
            keys, as_index=False, sort=True).agg(agg)
        # Arrow out, metadata-free: pandas blocks entering a downstream
        # Arrow reduce are converted by Ray via from_pandas, whose
        # metadata-carrying schema is unhashable in this pyarrow and
        # defeats block-schema dedup in every reduce task (VERDICT r04
        # item 6; values identical — the groupby above did the math)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(merge, batch_format="pandas")


def merge_partials_deterministic(partials: "rd.Dataset", keys: Sequence[str],
                                 n_parts: int = 64) -> "rd.Dataset":
    """Merge partial rows ``(key, bucket_ts, sum/min/max, n)`` into final
    tier points with a DETERMINISTIC float accumulation order: one
    hash-bucket shuffle on the key, then each partition sorts its rows by
    (key, bucket, sum, min, max, n) and reduces with ``np.reduceat`` — the
    result is byte-identical at any parallelism or shuffle arrival order
    (SURVEY.md §7.3.1; a plain ``groupby().aggregate(Sum)`` merges floats in
    arrival order and flips last-ulp bits between runs, which breaks the
    manifest lineage hashes — tests/test_resume.py)."""
    import numpy as np

    keys = list(keys)
    assert len(keys) == 1, "single rollup key expected"
    key = keys[0]

    def merge_part(t: pa.Table) -> pa.Table:
        codes, uniques = _dict_encode(t[key])
        b = t["bucket_ts"].cast(pa.int64()).to_numpy()
        sv = t["sum_value"].to_numpy(zero_copy_only=False).astype(np.float64)
        mn = t["min_value"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx = t["max_value"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # total order: ties have identical payloads, so the sum is invariant
        order = np.lexsort((n, mx, mn, sv, b, codes))
        codes, b = codes[order], b[order]
        sv, mn, mx, n = sv[order], mn[order], mx[order], n[order]
        boundary = np.concatenate(
            ([True], (codes[1:] != codes[:-1]) | (b[1:] != b[:-1])))
        idx = np.flatnonzero(boundary)
        sums = np.add.reduceat(np.nan_to_num(sv, nan=0.0), idx)
        mins = np.fmin.reduceat(mn, idx)
        maxs = np.fmax.reduceat(mx, idx)
        ns = np.add.reduceat(n, idx)
        sums[ns == 0] = np.nan
        with np.errstate(invalid="ignore"):
            mean = sums / ns
        return pa.table({
            key: pc.take(uniques, pa.array(codes[idx])),
            "bucket_ts": pa.array(b[idx], type=pa.timestamp("us")),
            "sum_value": pa.array(sums, from_pandas=True),
            "min_value": pa.array(mins, from_pandas=True),
            "max_value": pa.array(maxs, from_pandas=True),
            "n": pa.array(ns),
            "mean_value": pa.array(mean, from_pandas=True),
        })

    parted = _add_part(partials, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda t: merge_part(t.drop_columns(["_part"])),
        batch_format="pyarrow")


def rollup(ds: "rd.Dataset", keys: Sequence[str], ts_col: str, value_col: str,
           tier: str = "1m") -> "rd.Dataset":
    """Tier points ``(keys..., bucket_ts, n, sum/min/max/mean_value)`` for one
    tier, via map-side partials + one deterministic hash-shuffle merge."""
    keys = list(keys)
    partial = ds.map_batches(
        lambda b: _partial_batch(b, keys, ts_col, value_col, tier),
        batch_format="pyarrow")
    return merge_partials_deterministic(partial, keys)


def cascade(tier_points: "rd.Dataset", keys: Sequence[str],
            coarser_tier: str) -> "rd.Dataset":
    """Roll a finer tier's points up to a coarser tier by re-aggregating the
    partial columns (sum of sums, min of mins, max of maxes, sum of counts) —
    the raw input is never touched again."""
    keys = list(keys)

    def rebucket(b: pa.Table) -> pa.Table:
        # NO map-side combine here: a per-batch group_by would make the
        # partial VALUES depend on batch/block layout, so the final sorted
        # merge would add different intermediate sums run-to-run (last-ulp
        # flips -> lineage hash churn, tests/test_resume.py). Finer-tier
        # rows are already aggregates (tiny), so shuffling them raw costs
        # nothing; the deterministic merge does all the reduction.
        b = b.drop_columns(["mean_value"]) if "mean_value" in b.column_names else b
        return b.set_column(b.column_names.index("bucket_ts"), "bucket_ts",
                            floor_bucket(b["bucket_ts"], coarser_tier))

    partial = tier_points.map_batches(rebucket, batch_format="pyarrow")
    return merge_partials_deterministic(partial, keys)


TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _add_part(ds: "rd.Dataset", key: str, n_parts: int) -> "rd.Dataset":
    """Stable hash-bucket column (crc32 of the key, parallelism-independent)."""
    import numpy as np
    import pandas as pd

    def fn(b: pa.Table) -> pa.Table:
        col = b[key].to_pandas().to_numpy()
        # pd.util.hash_array: vectorized siphash with a FIXED default key —
        # deterministic across processes (never use builtin hash here)
        parts = (pd.util.hash_array(col) % n_parts).astype(np.int32)
        return b.append_column("_part", pa.array(parts))

    return ds.map_batches(fn, batch_format="pyarrow")


def _dict_encode(col: pa.ChunkedArray | pa.Array):
    """Arrow dictionary-encode a key column -> (codes int64 np, uniques
    pa.Array). C-speed; object-dtype keys never touch pandas/python."""
    import numpy as np

    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, enc.dictionary


def _check_tier_order(tiers) -> None:
    """The cascade re-buckets finest-to-coarsest from the 1m base; a
    coarser-to-finer order would silently produce wrong buckets (rebucketing
    already-coarsened partials is a no-op) — reject it (ADVICE r01)."""
    tiers = list(tiers)
    known = [t for t in TIERS if t in tiers]
    if tiers != known or len(set(tiers)) != len(tiers):
        raise ValueError(
            f"tiers must be an ordered subsequence of {TIERS}, got {tiers!r}")


def _tier_tables(kcol: str, codes, uniques: pa.Array, ts_us, vals,
                 tiers, dict_out: bool = False) -> pa.Table:
    """Vectorized tier cascade over MANY keys at once (one partition's worth
    of conversations). All grouping runs on dictionary codes + int64 buckets
    via np.lexsort + np.reduceat; output is a pyarrow Table built zero-copy
    from numpy (pandas blocks at 10^8-row scale cost pickle serialization
    through the object store — measured 4x slower end-to-end).

    ``dict_out``: emit the key and tier columns as Arrow DICTIONARY arrays
    instead of materialized strings. At 10^8 output points the flat key
    column alone is gigabytes of string data that exists only to repeat a
    per-partition vocabulary — dictionary output skips the string gather
    entirely and cuts the bytes every downstream consumer moves (the
    values are identical; pandas sees Categorical). Default OFF so
    small-scale query schemas stay plain strings for the oracle compare."""
    import numpy as np

    ktype = uniques.type if uniques is not None else pa.string()
    if dict_out:
        ktype = pa.dictionary(pa.int32(), ktype)
    empty_schema = pa.schema([
        (kcol, ktype),
        ("tier", pa.dictionary(pa.int8(), pa.string()) if dict_out
         else pa.string()),
        ("sum_value", pa.float64()),
        ("min_value", pa.float64()), ("max_value", pa.float64()),
        ("n", pa.int64()), ("bucket_ts", pa.timestamp("us")),
        ("mean_value", pa.float64()),
    ])
    _check_tier_order(tiers)
    if len(ts_us) == 0:
        return empty_schema.empty_table()

    # deterministic accumulation order (SURVEY.md §7.3.1): sort by
    # (key, ts) — not merely (key, bucket) — so per-bucket sums always add
    # in time order regardless of shuffle arrival order; this is what makes
    # the tier points bit-exactly reproducible and equal to the sequential
    # single-process oracle
    order = np.lexsort((ts_us, codes))
    codes_s = codes[order]
    b1_s = (ts_us[order] // TIER_US["1m"]) * TIER_US["1m"]
    vals_s = vals[order]
    boundary = np.concatenate(
        ([True], (codes_s[1:] != codes_s[:-1]) | (b1_s[1:] != b1_s[:-1])))
    idx = np.flatnonzero(boundary)
    n = np.add.reduceat((~np.isnan(vals_s)).astype(np.int64), idx)
    sums = np.add.reduceat(np.nan_to_num(vals_s, nan=0.0), idx)
    mins = np.fmin.reduceat(vals_s, idx)
    maxs = np.fmax.reduceat(vals_s, idx)
    sums[n == 0] = np.nan
    cur_code, cur_bucket = codes_s[idx], b1_s[idx]

    tables = []
    for tier in tiers:
        if tier != "1m":
            cur_bucket = cur_bucket // TIER_US[tier] * TIER_US[tier]
            # rows stay sorted by (code, coarser bucket); merge adjacent runs
            key2 = np.concatenate(
                ([True], (cur_code[1:] != cur_code[:-1])
                 | (cur_bucket[1:] != cur_bucket[:-1])))
            idx2 = np.flatnonzero(key2)
            sums = np.add.reduceat(np.nan_to_num(sums, nan=0.0), idx2)
            mins = np.fmin.reduceat(mins, idx2)
            maxs = np.fmax.reduceat(maxs, idx2)
            n2 = np.add.reduceat(n, idx2)
            sums[n2 == 0] = np.nan
            n = n2
            cur_code, cur_bucket = cur_code[idx2], cur_bucket[idx2]
        m = cur_code.size
        with np.errstate(invalid="ignore"):
            mean = sums / n
        if dict_out:
            karr = pa.DictionaryArray.from_arrays(
                pa.array(cur_code.astype(np.int32)), uniques)
            tarr = pa.DictionaryArray.from_arrays(
                pa.array(np.full(m, tiers.index(tier), dtype=np.int8)),
                pa.array(list(tiers), type=pa.string()))
        else:
            karr = pc.take(uniques, pa.array(cur_code))
            tarr = pa.array(np.repeat(tier, m))
        tables.append(pa.table({
            kcol: karr,
            "tier": tarr,
            "sum_value": pa.array(sums, from_pandas=True),
            "min_value": pa.array(mins, from_pandas=True),
            "max_value": pa.array(maxs, from_pandas=True),
            "n": pa.array(n),
            "bucket_ts": pa.array(cur_bucket, type=pa.timestamp("us")),
            "mean_value": pa.array(mean, from_pandas=True),
        }))
    return pa.concat_tables(tables)


def value_tiers_per_key(ds: "rd.Dataset", key: str, ts_col: str,
                        value_col: str, tiers=TIERS,
                        n_parts: int = 64) -> "rd.Dataset":
    """Fused per-key rollup: ONE hash shuffle (on a stable key-hash bucket,
    not the raw key), then the whole tier cascade (1m -> 1h -> 1d partial
    re-aggregation) runs VECTORIZED across all of a partition's keys inside
    one Arrow UDF call.

    Why partitions, not per-key groups: with millions of conversations a
    per-group UDF pays Python overhead per conversation (~ms) — the dominant
    cost at 10^6+ keys. Bucketing into ``n_parts`` partitions keeps whole
    conversations co-located (same exactness) while amortizing UDF overhead
    over thousands of keys per call. Chained groupby(key, bucket) stages
    would instead pay one all-to-all exchange per tier — measured 28x slower
    at sf0.1; per-conversation map_groups measured 25x slower at 600k keys.

    ``n_parts`` sizing (measured at 223M rows): ~450k rows per bucket
    pipelines the exchange best (64 parts -> 60s, 512 -> 14s at 32 CPUs);
    use ``max(64, rows // 450_000)``. On a real cluster this is also the
    resume/skew granule — hot keys are bounded by the largest single
    conversation, never by partition count.
    """
    import numpy as np

    _check_tier_order(tiers)

    def fn(t: pa.Table) -> pa.Table:
        codes, uniques = _dict_encode(t[key])
        ts_us = t[ts_col].cast(pa.int64()).to_numpy()
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return _tier_tables(key, codes, uniques, ts_us, vals, list(tiers))

    parted = _add_part(ds, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda t: fn(t.drop_columns(["_part"])), batch_format="pyarrow")


def latency_tiers_from_events(ds: "rd.Dataset", key: str = "user_id",
                              ts_col: str = "ts", order_col: str = "event_id",
                              tiers=TIERS, out_key: str | None = "conv_id",
                              n_parts: int = 64,
                              dict_out: bool = False) -> "rd.Dataset":
    """Flagship fused path: hash-bucket shuffle -> per-partition vectorized
    (lexsort by (key-code, ts, order) -> per-key latency via masked diff ->
    full tier cascade). One shuffle total; Arrow in/out; UDF cost amortized
    over all keys in a partition (see :func:`value_tiers_per_key`).

    With ``out_key`` set, output keys are ``'c' || key`` (the events->conv_id
    convention); ``out_key=None`` keeps the key column as-is."""
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        kcol = out_key or key
        if len(t) == 0:
            return _tier_tables(kcol, None, pa.array([], type=pa.string()),
                                np.empty(0, dtype=np.int64), np.empty(0),
                                list(tiers), dict_out=dict_out)
        codes, uniques = _dict_encode(t[key])
        ts_raw = t[ts_col].cast(pa.int64()).to_numpy()
        order = np.lexsort((t[order_col].to_numpy(zero_copy_only=False),
                            ts_raw, codes))
        codes = codes[order]
        ts_us = ts_raw[order]
        lat = np.empty(ts_us.size)
        lat[1:] = np.diff(ts_us) / 1e6
        # first turn of every conversation has no predecessor
        first = np.empty(ts_us.size, dtype=bool)
        first[0] = True
        first[1:] = codes[1:] != codes[:-1]
        lat[first] = np.nan
        if out_key:
            uniques = pc.binary_join_element_wise(
                pa.array(np.repeat("c", len(uniques))),
                uniques.cast(pa.string()), pa.scalar(""))
        return _tier_tables(kcol, codes, uniques, ts_us, lat, list(tiers),
                            dict_out=dict_out)

    parted = _add_part(ds, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda t: fn(t.drop_columns(["_part"])), batch_format="pyarrow")


def rate_by(ds: "rd.Dataset", dim_col: str, ts_col: str,
            tier: str = "1h") -> "rd.Dataset":
    """Per-(dimension, bucket) turn counts (role / tool turn rates of the
    north star). Same partial+final structure, count-only payload."""

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("bucket_ts", floor_bucket(b[ts_col], tier))
        out = b.group_by([dim_col, "bucket_ts"]).aggregate([(dim_col, "count")])
        return out.rename_columns([dim_col, "bucket_ts", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    merged = p.groupby([dim_col, "bucket_ts"]).aggregate(
        Sum("n", alias_name="n"))

    def fix_unit(b: pa.Table) -> pa.Table:
        # Ray's aggregate path can downcast hour/day-aligned timestamps to
        # seconds; pin the schema back to µs
        i = b.column_names.index("bucket_ts")
        return b.set_column(i, "bucket_ts",
                            pc.cast(b["bucket_ts"], pa.timestamp("us")))

    return merged.map_batches(fix_unit, batch_format="pyarrow")


def retention_trim(tier_points: "rd.Dataset", keys: Sequence[str],
                   keep_last: int, n_parts: int = 64) -> "rd.Dataset":
    """Per-key retention: keep only the most recent ``keep_last`` buckets of
    each key — per-key top-k by bucket_ts, computed vectorized across all of
    a hash partition's keys (sort + cumcount-from-end); never a global
    sort."""
    keys = list(keys)
    assert len(keys) == 1, "single retention key expected"
    key = keys[0]

    def trim_part(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([key, "bucket_ts"],
                          ascending=[True, False], kind="mergesort")
        rank = g.groupby(key, sort=False).cumcount()
        return g[rank < keep_last]

    parted = _add_part(tier_points, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda g: trim_part(g.drop(columns=["_part"])),
        batch_format="pandas")


def quantiles_per_key(ds: "rd.Dataset", key: str, ts_col: str,
                      value_col: str, tier: str,
                      qs: Sequence[float] = (0.5, 0.95, 0.99),
                      names: Sequence[str] | None = None,
                      n_parts: int = 64) -> "rd.Dataset":
    """Exact per-(key, tier-bucket) quantiles (p50/p95/p99-style continuous
    aggregates) — linear interpolation at ``q*(n-1)``, the SQL
    ``quantile_cont`` definition.

    Unlike sum/min/max/count partials, quantiles do NOT compose across
    partial aggregates, so this op hash-shuffles the raw (key, ts, value)
    triples ONCE (24 B/row — the same narrow-exchange discipline as the
    rollup partials) and computes every group of a partition in one
    vectorized pass: a single ``np.lexsort`` over (key-code, bucket, value),
    segment boundaries, then fancy-indexed interpolation for all groups and
    all ``qs`` at once — no per-group Python. At 100 TB this is the one
    aggregate that cannot ride the 1m->1h->1d cascade; coarser tiers
    recompute from raw points (or switch to a mergeable sketch — t-digest —
    when approximate answers are acceptable; exactness is kept here for
    oracle parity).
    """
    import numpy as np

    names = list(names or [f"p{round(q * 100)}" for q in qs])
    parted = _add_part(ds.select_columns([key, ts_col, value_col]),
                       key, n_parts)

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.append_column("bucket_ts", floor_bucket(t[ts_col], tier))
        codes, uniques = _dict_encode(t[key])
        ts_us = t["bucket_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if codes.size == 0:
            cols = {key: uniques.take(pa.array([], type=pa.int64())),
                    "bucket_ts": pa.array([], type=pa.timestamp("us"))}
            for nm in names:
                cols[nm] = pa.array([], type=pa.float64())
            return pa.table(cols)
        order = np.lexsort((v, ts_us, codes))
        c, b, v = codes[order], ts_us[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1]))))
        lens = np.diff(np.append(starts, c.size))
        cols = {key: pc.take(uniques, pa.array(c[starts])),
                "bucket_ts": pa.array(b[starts], type=pa.timestamp("us"))}
        for q, nm in zip(qs, names):
            # frac computed SEGMENT-LOCALLY: adding the (possibly large)
            # segment start before taking the fractional part truncates
            # low mantissa bits and shifts the interpolation by an ulp —
            # enough to flip the 6dp rounding against the oracle
            pos = q * (lens - 1)
            lo = np.floor(pos).astype(np.int64)
            frac = pos - lo
            i = starts + lo
            hi = np.minimum(i + 1, starts + lens - 1)
            cols[nm] = pa.array(v[i] + (v[hi] - v[i]) * frac,
                                type=pa.float64())
        return pa.table(cols)

    return parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
