"""Gap-fill of tier points: densify each key's bucket grid and fill missing
buckets, per group, after an in-UDF sort (Ray gives no cross-batch per-key
order — SURVEY.md §7.3.2).

Fill methods:

- ``"linear"`` — np.interp over the observed support, the reference's simple
  gap-fill (``/root/reference/src/tsUtils.py:171-187``);
- ``"mid"``    — the reference's least-informative mid-range fill
  ``(nanmin+nanmax)/2`` (``/root/reference/src/models/tsSVDModel.py:142-148``);
- ``"svd"`` / ``"als"`` — page-matrix low-rank imputation via the tslib model
  kernels (``src/models/tsSVDModel.py`` / ``tsALSModel.py``) folded to an
  N x M page matrix chosen from the series length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..kernels import tsutils
from ..kernels.tsmodel import ALSModel, SVDModel

TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def choose_page_dims(T: int, n_rows_target: int = 50) -> tuple[int, int]:
    """Pick page-matrix dims N x M <= T with N <= n_rows_target and N*M
    maximal (the model truncates to the last N*M points —
    ``tsSVDModel.py:165,170``)."""
    N = max(1, min(n_rows_target, T // 2))
    M = T // N
    return N, M


def impute_series(values: np.ndarray, method: str, k: int = 5,
                  seed: int = 0) -> np.ndarray:
    """Fill NaNs in one sorted series. Pure-numpy; runs inside group UDFs."""
    v = np.asarray(values, dtype=np.float64)
    if not np.isnan(v).any():
        return v.copy()
    if np.isnan(v).all():
        return np.zeros_like(v)
    if method == "linear":
        return tsutils.nan_interpolate(v)
    if method == "mid":
        fill = 0.5 * (np.nanmin(v) + np.nanmax(v))
        return np.where(np.isnan(v), fill, v)
    if method in ("svd", "als"):
        T = v.size
        N, M = choose_page_dims(T)
        usable = N * M
        head = v[: T - usable]
        tail = v[T - usable:]
        if method == "svd":
            model = SVDModel("s", min(k, N, M), N, M).fit({"s": tail})
        else:
            model = ALSModel("s", min(k, N, M), N, M,
                             rng=np.random.default_rng(seed)).fit({"s": tail})
        denoised = model.denoised()["s"]
        # keep observed points, replace only the gaps (imputation, not
        # denoising, is the gap-fill contract)
        filled = np.where(np.isnan(tail), denoised, tail)
        out = np.concatenate([tsutils.nan_interpolate(head), filled])
        return out
    raise ValueError(f"unknown fill method {method!r}")


def _dense_grid_group(g: pd.DataFrame, tier: str, value_col: str, method: str,
                      k: int) -> pd.DataFrame:
    """Densify one key's bucket series and fill the planted gaps."""
    g = g.sort_values("bucket_ts", kind="mergesort")
    step = TIER_US[tier]
    ts = g["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    lo, hi = ts[0], ts[-1]
    grid = np.arange(lo, hi + step, step, dtype=np.int64)
    pos = (ts - lo) // step
    vals = np.full(grid.size, np.nan)
    vals[pos] = g[value_col].to_numpy(dtype=np.float64)
    observed = np.zeros(grid.size, dtype=bool)
    observed[pos] = True
    key_cols = {c: np.repeat(g[c].iloc[0], grid.size)
                for c in g.columns
                if c not in ("bucket_ts", value_col, "sum_value", "min_value",
                             "max_value", "n", "mean_value")}
    # deterministic per-group seed from the key values (PYTHONHASHSEED-free)
    import zlib
    key_repr = "|".join(f"{c}={g[c].iloc[0]}" for c in sorted(key_cols))
    seed = zlib.crc32(key_repr.encode()) & 0x7FFFFFFF
    return pd.DataFrame({
        **key_cols,
        "bucket_ts": grid.astype("datetime64[us]"),
        value_col: impute_series(vals, method, k=k, seed=seed),
        "observed": observed,
    })


def gap_fill(tier_points: "rd.Dataset", keys, tier: str,
             value_col: str = "mean_value", method: str = "linear",
             k: int = 5) -> "rd.Dataset":
    """Dense per-key bucket grid with gaps filled; adds ``observed`` flag.
    One shuffle on the group key, order restored inside the UDF."""
    keys = list(keys)
    cols = keys + ["bucket_ts", value_col]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return _dense_grid_group(g[cols], tier, value_col, method, k)

    return tier_points.groupby(keys).map_groups(fn, batch_format="pandas")
