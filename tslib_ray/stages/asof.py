"""As-of (most-recent-prior) join and trailing-window aggregates.

Neither exists in the reference (tslib is numeric-kernel-only) or in Ray
Data's Dataset API; both are core time-series engine operators (the
"custom operator" tier of the build plan: composition of one hash shuffle +
a vectorized per-group merge, never raw actors).

Plan shape (both operators):

- ONE all-to-all exchange, hash-partitioned on the ``by`` key — the two
  sides are lifted to a shared schema with typed null padding and a side
  flag, unioned, and ``groupby(by)`` co-locates each key's full history.
- Per-group kernel is pure ``np.searchsorted`` over the sorted ``on``
  column — O(n log n) per group, no Python row loop.
- Partitioning assumption (documented per the build plan): one ``by``
  group fits a worker heap. Hot keys must be salted upstream — the same
  assumption every ``groupby().map_groups`` stage in this repo makes.

DuckDB mirrors (the driver oracle): ``ASOF LEFT JOIN`` for
:func:`asof_join`; ``RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW``
window frames for :func:`rolling_window_agg`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def asof_join(left: "rd.Dataset", right: "rd.Dataset", by: str, on: str,
              right_cols: list[str], suffix: str = "_prev",
              direction: str = "backward", how: str = "left") -> "rd.Dataset":
    """For every left row, attach ``right_cols`` from the right row with the
    largest ``on <= left.on`` (direction="backward", inclusive — DuckDB
    ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``) or the smallest
    ``on >= left.on`` ("forward") within the same ``by`` group. With
    ``how="left"`` unmatched left rows keep nulls; ``how="inner"`` drops
    them (DuckDB ``ASOF JOIN``). All left columns are preserved.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner: {how}")
    def _pa_type(t) -> pa.DataType:
        # Dataset.schema() yields numpy dtypes for pandas-backed blocks;
        # object columns in that representation are strings
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        return pa.string() if dt.kind == "O" else pa.from_numpy_dtype(dt)

    lsch, rsch = left.schema(), right.schema()
    ltypes = {n: _pa_type(t) for n, t in zip(lsch.names, lsch.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rsch.names, rsch.types)}
    left_cols = list(lsch.names)
    out_right = [c + suffix for c in right_cols]
    clash = set(out_right) & set(left_cols)
    if clash:
        raise ValueError(f"suffixed right columns clash with left: {clash}")

    def lift_left(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {c: b[c] for c in left_cols}
        for c, oc in zip(right_cols, out_right):
            cols[oc] = pa.nulls(n, type=rtypes[c])
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def lift_right(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {}
        for c in left_cols:
            if c == by or c == on:
                cols[c] = b[c]
            else:
                cols[c] = pa.nulls(n, type=ltypes[c])
        for c, oc in zip(right_cols, out_right):
            cols[oc] = b[c]
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    both = left.map_batches(lift_left, batch_format="pyarrow").union(
        right.select_columns(sorted({by, on, *right_cols}))
             .map_batches(lift_right, batch_format="pyarrow"))

    def _restore_left_dtypes(res: pd.DataFrame) -> pd.DataFrame:
        # the union's typed null padding makes pandas widen int/bool left
        # columns to float in the group frame; left rows themselves are
        # never null there, so cast back
        for c in left_cols:
            t = ltypes[c]
            if pa.types.is_integer(t) and res[c].dtype.kind == "f":
                res[c] = res[c].astype(str(t))
            elif pa.types.is_boolean(t) and res[c].dtype.kind != "b":
                res[c] = res[c].astype(bool)
        return res

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"].to_numpy() == 0]
        rg = g[g["_side"].to_numpy() == 1]
        rg = rg.sort_values(on, kind="mergesort")
        out = lg[left_cols].reset_index(drop=True)
        r_on = rg[on].to_numpy()
        l_on = lg[on].to_numpy()
        if direction == "backward":
            idx = np.searchsorted(r_on, l_on, side="right") - 1
            missing = idx < 0
        else:
            idx = np.searchsorted(r_on, l_on, side="left")
            missing = idx >= r_on.size
        if how == "inner":
            if r_on.size == 0:
                return _restore_left_dtypes(pd.concat(
                    [out.iloc[:0],
                     rg[out_right].iloc[:0].reset_index(drop=True)], axis=1))
            keep = ~missing
            out = out[keep].reset_index(drop=True)
            take = rg[out_right].iloc[idx[keep]].reset_index(drop=True)
            return _restore_left_dtypes(pd.concat([out, take], axis=1))
        if r_on.size == 0:
            take = pd.DataFrame(
                {oc: pd.Series([None] * len(out)) for oc in out_right})
        else:
            take = rg[out_right].iloc[np.clip(idx, 0, r_on.size - 1)] \
                .reset_index(drop=True)
            if missing.any():
                take.loc[missing, :] = None
        return _restore_left_dtypes(pd.concat([out, take], axis=1))

    return both.groupby(by).map_groups(merge, batch_format="pandas")


def rolling_window_agg(ds: "rd.Dataset", by: str, on: str, value_col: str,
                       window: "pd.Timedelta | int",
                       out_prefix: str = "w_") -> "rd.Dataset":
    """Trailing-window aggregate per key: for every row, the count / sum /
    mean of ``value_col`` over rows of the same ``by`` key with
    ``on in [row.on - window, row.on]`` — SQL ``RANGE BETWEEN window
    PRECEDING AND CURRENT ROW`` (peer rows at the exact same ``on`` are all
    included, per RANGE-frame semantics). Vectorized per group: one sort,
    two ``searchsorted`` passes over the prefix-sum."""
    window_us = (int(window.to_timedelta64() // np.timedelta64(1, "us"))
                 if isinstance(window, pd.Timedelta) else int(window))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(on, kind="mergesort").reset_index(drop=True)
        t = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        cum = np.concatenate(([0.0], np.cumsum(v)))
        lo = np.searchsorted(t, t - window_us, side="left")
        hi = np.searchsorted(t, t, side="right")  # include equal-ts peers
        n = hi - lo
        s = cum[hi] - cum[lo]
        out = g.copy()
        out[out_prefix + "count"] = n.astype(np.int64)
        out[out_prefix + "sum"] = s
        out[out_prefix + "mean"] = s / np.maximum(n, 1)
        return out

    return ds.groupby(by).map_groups(fn, batch_format="pandas")
