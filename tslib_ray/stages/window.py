"""Per-key ordered window operators: counter-reset rate (`increase`) and
time-weighted average — the two bucket aggregates a plain sum/mean rollup
cannot express because they depend on each sample's NEIGHBOR, not just its
bucket.

Neither exists in the reference (tslib is numeric-kernel-only); both are
standard time-series engine operators (the monitoring-system `increase()` /
`rate()` family popularized by Prometheus, and the interval-weighted mean a
gauge needs when samples are unevenly spaced).

Plan shape (both): ONE stable hash-bucket shuffle on the series key
(:func:`~tslib_ray.stages.rollup._add_part` — crc-style, parallelism-
independent), then each partition lexsorts its rows by ``(key, ts,
tiebreak)`` and computes every key's deltas/weights in ONE vectorized pass
with key-boundary masks — no per-key Python loop, no per-row loop. Bucket
sums use ``np.add.reduceat`` over the (already contiguous) ``(key,
bucket)`` segments, so the accumulation order is deterministic under any
input partitioning (the same argument as the rollup cascade's lexsort +
reduceat merge, rollup.py:98).

Partitioning assumption (documented per the build plan): one series key's
history fits a worker heap — the same assumption every per-key stage in
this repo makes; hot keys must be salted upstream.

DuckDB mirrors: ``lag(value) OVER (PARTITION BY key ORDER BY ts, tiebreak)``
for :func:`counter_increase`; ``lead(ts) OVER (PARTITION BY key, bucket
...)`` + ``date_diff('microsecond', ...)`` for :func:`time_weighted_avg`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .rollup import TIER_UNIT, _add_part, _dict_encode

_TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _sorted_partition(t: pa.Table, key: str, ts_col: str,
                      tiebreak: str | None):
    """(codes, uniques, order, ts_us) with ``order`` the lexsort by
    ``(key, ts, tiebreak)`` — the shared front half of both operators."""
    codes, uniques = _dict_encode(t[key])
    ts_us = t[ts_col].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    if tiebreak is not None:
        tb = t[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts_us, codes))
    else:
        order = np.lexsort((ts_us, codes))
    return codes, uniques, order, ts_us


def counter_increase(ds: "rd.Dataset", key: str, ts_col: str,
                     value_col: str, tier: str,
                     tiebreak: str | None = None,
                     n_parts: int = 64) -> "rd.Dataset":
    """Monotonic-counter increase per ``(key, tier-bucket)`` with reset
    handling: per key in ``(ts, tiebreak)`` order, ``delta_i = v_i -
    v_{i-1}``; a negative delta means the counter reset, and the increase
    since the previous sample is taken as ``v_i`` itself (the counter
    restarted from ~0 — Prometheus ``increase()`` semantics). Each key's
    FIRST sample has no predecessor and contributes nothing. Output:
    ``(key, bucket_ts, increase, n_deltas)`` where ``bucket_ts`` is the
    tier floor of the CURRENT sample's timestamp; buckets whose only
    samples are first-samples are absent.
    """
    assert tier in TIER_UNIT, tier
    step = _TIER_US[tier]

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques, order, ts_us = _sorted_partition(
            t, key, ts_col, tiebreak)
        if codes.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "bucket_ts": pa.array([], pa.timestamp("us")),
                             "increase": pa.array([], pa.float64()),
                             "n_deltas": pa.array([], pa.int64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c, ts_s, v_s = codes[order], ts_us[order], v[order]
        first = np.concatenate(([True], c[1:] != c[:-1]))
        delta = np.empty_like(v_s)
        delta[0] = 0.0
        delta[1:] = v_s[1:] - v_s[:-1]
        inc = np.where(delta < 0, v_s, delta)  # reset -> counter restarted
        keep = ~first
        c, b, inc = c[keep], (ts_s[keep] // step) * step, inc[keep]
        # (key, bucket) segments are contiguous: rows are key-major and
        # ts-sorted within key, and the bucket floor is monotone in ts
        newseg = np.concatenate(([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(newseg)
        if starts.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "bucket_ts": pa.array([], pa.timestamp("us")),
                             "increase": pa.array([], pa.float64()),
                             "n_deltas": pa.array([], pa.int64())})
        sums = np.add.reduceat(inc, starts)
        counts = np.diff(np.append(starts, c.size))
        return pa.table({key: uniques.take(pa.array(c[starts])),
                         "bucket_ts": pa.array(b[starts],
                                               type=pa.timestamp("us")),
                         "increase": pa.array(sums, type=pa.float64()),
                         "n_deltas": pa.array(counts, type=pa.int64())})

    cols = [key, ts_col, value_col] + ([tiebreak] if tiebreak else [])
    parted = _add_part(ds.select_columns(cols), key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")


def lag_delta(ds: "rd.Dataset", key: str, order_col: str, value_col: str,
              tiebreak: str | None = None, n_parts: int = 64,
              out_col: str = "delta") -> "rd.Dataset":
    """Period-over-period change: per key in ``order_col`` order, attach
    ``value - lag(value)``; each key's first row (no predecessor) is
    dropped. Composes with the rollup cascade — run it on a tier slice to
    get the bucket-over-bucket delta of any rolled-up series (the lag is
    over PRESENT buckets, matching SQL ``lag() OVER (ORDER BY bucket)``
    on a sparse series). Output: ``(key, order_col, value_col, out_col)``.
    """

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques, order, ts_us = _sorted_partition(
            t, key, order_col, tiebreak)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c, ts_s, v_s = codes[order], ts_us[order], v[order]
        first = np.concatenate(([True], c[1:] != c[:-1])) \
            if codes.size else np.zeros(0, dtype=bool)
        delta = np.empty_like(v_s)
        if v_s.size:
            delta[0] = 0.0
            delta[1:] = v_s[1:] - v_s[:-1]
        keep = ~first
        return pa.table({key: uniques.take(pa.array(c[keep])),
                         order_col: pa.array(ts_s[keep],
                                             type=pa.timestamp("us")),
                         value_col: pa.array(v_s[keep], type=pa.float64()),
                         out_col: pa.array(delta[keep], type=pa.float64())})

    cols = [key, order_col, value_col] + ([tiebreak] if tiebreak else [])
    parted = _add_part(ds.select_columns(cols), key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")


def ewma_terminal(ds: "rd.Dataset", key: str, ts_col: str, value_col: str,
                  alpha: float, tiebreak: str | None = None,
                  n_parts: int = 64) -> "rd.Dataset":
    """Terminal exponentially-weighted moving average per key:
    ``s_1 = v_1; s_i = alpha * v_i + (1 - alpha) * s_{i-1}`` evaluated in
    ``(ts, tiebreak)`` order — via the closed form ``s_n = (1-a)^(n-1) v_1
    + sum_{i>=2} a (1-a)^(n-i) v_i``, which turns the sequential recurrence
    into one vectorized weighted reduceat per partition (and is what makes
    it SQL-mirrorable with ``pow()`` + ``row_number()``). Output: ``(key,
    ewma, n_samples)``."""
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques, order, ts_us = _sorted_partition(
            t, key, ts_col, tiebreak)
        if codes.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "ewma": pa.array([], pa.float64()),
                             "n_samples": pa.array([], pa.int64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c, v_s = codes[order], v[order]
        newseg = np.concatenate(([True], c[1:] != c[:-1]))
        starts = np.flatnonzero(newseg)
        seg_id = np.cumsum(newseg) - 1
        counts = np.diff(np.append(starts, c.size))
        rank = np.arange(c.size) - starts[seg_id]       # 0-based position
        expo = (counts[seg_id] - 1 - rank).astype(np.float64)
        w = alpha * np.power(1.0 - alpha, expo)
        w[newseg] = np.power(1.0 - alpha, expo[newseg])  # first: no alpha
        s = np.add.reduceat(w * v_s, starts)
        return pa.table({key: uniques.take(pa.array(c[starts])),
                         "ewma": pa.array(s, type=pa.float64()),
                         "n_samples": pa.array(counts, type=pa.int64())})

    cols = [key, ts_col, value_col] + ([tiebreak] if tiebreak else [])
    parted = _add_part(ds.select_columns(cols), key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")


def time_weighted_avg(ds: "rd.Dataset", key: str, ts_col: str,
                      value_col: str, tier: str,
                      tiebreak: str | None = None,
                      n_parts: int = 64) -> "rd.Dataset":
    """Time-weighted mean per ``(key, tier-bucket)``: each sample's weight
    is the microseconds until the key's NEXT sample in the same bucket;
    the bucket's last sample carries forward to the bucket end (LOCF).
    Unweighted mean overweights burst periods; this is the gauge semantics
    (``twa = sum(v_i * w_i) / sum(w_i)``). Duplicate-timestamp samples get
    weight 0 except the last in tiebreak order; the denominator is always
    positive (the final sample's weight ``bucket_end - ts`` is > 0 since
    the bucket end is exclusive). Output: ``(key, bucket_ts, twa,
    n_samples)``.
    """
    assert tier in TIER_UNIT, tier
    step = _TIER_US[tier]

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques, order, ts_us = _sorted_partition(
            t, key, ts_col, tiebreak)
        if codes.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "bucket_ts": pa.array([], pa.timestamp("us")),
                             "twa": pa.array([], pa.float64()),
                             "n_samples": pa.array([], pa.int64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c, ts_s, v_s = codes[order], ts_us[order], v[order]
        b = (ts_s // step) * step
        last = np.concatenate(((c[1:] != c[:-1]) | (b[1:] != b[:-1]), [True]))
        nxt = np.empty_like(ts_s)
        nxt[:-1] = ts_s[1:]
        nxt[last] = b[last] + step  # LOCF to the (exclusive) bucket end
        w = (nxt - ts_s).astype(np.float64)
        starts = np.flatnonzero(np.concatenate(
            ([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1]))))
        num = np.add.reduceat(v_s * w, starts)
        den = np.add.reduceat(w, starts)
        counts = np.diff(np.append(starts, c.size))
        return pa.table({key: uniques.take(pa.array(c[starts])),
                         "bucket_ts": pa.array(b[starts],
                                               type=pa.timestamp("us")),
                         "twa": pa.array(num / den, type=pa.float64()),
                         "n_samples": pa.array(counts, type=pa.int64())})

    cols = [key, ts_col, value_col] + ([tiebreak] if tiebreak else [])
    parted = _add_part(ds.select_columns(cols), key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")
