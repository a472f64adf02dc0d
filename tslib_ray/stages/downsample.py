"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) — the
shape-preserving per-series downsample a rollup cannot provide (a mean/min/
max tier flattens spikes; LTTB keeps the visually dominant points).

Distribution: ONE stable hash-bucket shuffle on the series key, then each
partition runs the sequential kernel per key over its (typically thousands
of) series. The kernel itself is O(n) with numpy inner steps; the per-key
Python loop is amortized across all points of the series (n_out is small
and the dominant cost is the area computation, vectorized per bucket). The
selection is deterministic: ties in triangle area resolve to the earliest
point (``np.argmax`` first-max), and the input is sorted by ``(ts, tiebreak
column)`` before bucketing, so distributed output equals the sequential
reference bit-for-bit (VALUES-oracle-checked).

Reference-parity note: tslib has no downsample operator; this implements
the "downsample" leg of the north rule's rollup + downsample + retention
engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .rollup import _add_part


def lttb_indices(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points of one series (already sorted by
    ts). First/last always kept; interior points bucketed into ``n_out - 2``
    equal-count buckets; each bucket keeps the point with the largest
    triangle area against the previously selected point and the NEXT
    bucket's centroid. Ties -> earliest index (argmax first-max)."""
    n = ts.size
    if n_out >= n or n_out < 3:
        return np.arange(n, dtype=np.int64)
    ts = ts.astype(np.float64)
    vals = vals.astype(np.float64)
    # bucket boundaries over the interior points [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = hi, (edges[i + 2] if i + 2 < edges.size else n)
        if nhi > nlo:  # next bucket centroid (last bucket: the final point)
            cx, cy = ts[nlo:nhi].mean(), vals[nlo:nhi].mean()
        else:
            cx, cy = ts[n - 1], vals[n - 1]
        ax, ay = ts[a], vals[a]
        area = np.abs((ax - cx) * (vals[lo:hi] - ay)
                      - (ax - ts[lo:hi]) * (cy - ay))
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    out[n_out - 1] = n - 1
    return out


def lttb_frame(g: pd.DataFrame, ts_col: str, value_col: str, n_out: int,
               order_cols: list[str]) -> pd.DataFrame:
    """Sequential reference: LTTB one series held in a frame (shared by the
    distributed path and the VALUES oracle builder so both execute the
    identical kernel; the *distribution* is what the oracle checks)."""
    g = g.sort_values(order_cols, kind="stable")
    idx = lttb_indices(g[ts_col].to_numpy().astype("datetime64[us]")
                       .astype(np.int64), g[value_col].to_numpy(), n_out)
    return g.iloc[idx]


def lttb_per_key(ds: "rd.Dataset", key: str, ts_col: str, value_col: str,
                 n_out: int = 16, tiebreak: str | None = None,
                 n_parts: int = 64) -> "rd.Dataset":
    """Distributed LTTB: hash-bucket the series key, downsample every series
    of a partition. ``tiebreak`` (e.g. an event id) pins the sort order when
    timestamps repeat, keeping the output deterministic."""
    order_cols = [ts_col] + ([tiebreak] if tiebreak else [])

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        outs = [lttb_frame(s, ts_col, value_col, n_out, order_cols)
                for _, s in g.groupby(key, sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else g

    parted = _add_part(ds, key, n_parts)
    return parted.groupby("_part").map_groups(part_fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# M4 aggregation (Jugel et al., VLDB 2014): min/max/first/last per
# (key, tier-bucket) — the error-free visualization downsample. Unlike
# LTTB, M4 is MERGEABLE: map-side partials bound the exchange at one row
# per (key, bucket) per block, then one narrow shuffle merges them, so the
# fact table never moves.
# ---------------------------------------------------------------------------

def _m4_reduce(codes, uniques, bts, vmin, vmax, fts, feid, fval,
               lts, leid, lval, key_name: str, final: bool) -> pa.Table:
    """Merge M4 partial rows per (key, bucket): min/max reduce; first =
    row with the smallest (first_ts, first_order), last = row with the
    largest (last_ts, last_order). Two lexsorts share the same segment
    order (both are (key, bucket)-major), one reduceat pass each."""
    import pyarrow.compute as pc

    if codes.size == 0:
        empty_i = pa.array([], type=pa.int64())
        cols = {key_name: pc.take(uniques, empty_i),
                "bucket_ts": pa.array([], type=pa.timestamp("us")),
                "vmin": pa.array([], type=pa.float64()),
                "vmax": pa.array([], type=pa.float64())}
        if final:
            cols["vfirst"] = pa.array([], type=pa.float64())
            cols["vlast"] = pa.array([], type=pa.float64())
        else:
            for nm in ("fts", "feid", "lts", "leid"):
                cols[nm] = pa.array([], type=pa.int64())
            cols["fval"] = pa.array([], type=pa.float64())
            cols["lval"] = pa.array([], type=pa.float64())
            cols = {c: cols[c] for c in
                    (key_name, "bucket_ts", "vmin", "vmax", "fts", "feid",
                     "fval", "lts", "leid", "lval")}
        return pa.table(cols)

    o1 = np.lexsort((feid, fts, bts, codes))
    c1, b1 = codes[o1], bts[o1]
    new = np.r_[True, (c1[1:] != c1[:-1]) | (b1[1:] != b1[:-1])]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], c1.size) - 1
    o2 = np.lexsort((leid, lts, bts, codes))
    cols = {
        key_name: pc.take(uniques, pa.array(c1[starts])),
        "bucket_ts": pa.array(b1[starts], type=pa.timestamp("us")),
        "vmin": pa.array(np.minimum.reduceat(vmin[o1], starts),
                         type=pa.float64()),
        "vmax": pa.array(np.maximum.reduceat(vmax[o1], starts),
                         type=pa.float64()),
    }
    if final:
        cols["vfirst"] = pa.array(fval[o1][starts], type=pa.float64())
        cols["vlast"] = pa.array(lval[o2][ends], type=pa.float64())
    else:
        cols.update({
            "fts": pa.array(fts[o1][starts], type=pa.int64()),
            "feid": pa.array(feid[o1][starts], type=pa.int64()),
            "fval": pa.array(fval[o1][starts], type=pa.float64()),
            "lts": pa.array(lts[o2][ends], type=pa.int64()),
            "leid": pa.array(leid[o2][ends], type=pa.int64()),
            "lval": pa.array(lval[o2][ends], type=pa.float64()),
        })
    return pa.table(cols)


def m4_per_key_tier(ds: "rd.Dataset", key: str, ts_col: str,
                    value_col: str, tier: str, order_col: str,
                    n_parts: int = 64) -> "rd.Dataset":
    """``(key, bucket_ts, vmin, vmax, vfirst, vlast)`` per (key,
    tier-bucket); first/last ordered by ``(ts, order_col)`` so ties are
    deterministic and the SQL mirror (row_number over the same order)
    matches exactly — min/max/first/last never interpolate, so every
    output value is an input value and the compare is bit-exact."""
    from .rollup import TIER_UNIT, _dict_encode, floor_bucket
    assert tier in TIER_UNIT, tier

    def partial(b: pa.Table) -> pa.Table:
        codes, uniques = _dict_encode(b[key])
        bts = floor_bucket(b[ts_col], tier).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ts = b[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # each raw row is a degenerate partial
        return _m4_reduce(codes, uniques, bts, v, v, ts, eid, v,
                          ts, eid, v, key, final=False)

    def merge(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        codes, uniques = _dict_encode(t[key])
        bts = t["bucket_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        g = {c: t[c].to_numpy(zero_copy_only=False) for c in
             ("vmin", "vmax", "fts", "feid", "fval", "lts", "leid", "lval")}
        return _m4_reduce(codes, uniques, bts, g["vmin"], g["vmax"],
                          g["fts"], g["feid"], g["fval"], g["lts"],
                          g["leid"], g["lval"], key, final=True)

    partials = ds.select_columns([key, ts_col, order_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow")
    parted = _add_part(partials, key, n_parts)
    return parted.groupby("_part").map_groups(merge,
                                              batch_format="pyarrow")
