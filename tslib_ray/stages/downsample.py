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
