"""North-rule gate (BASELINE.json): the engine's rolled-up points must match
a single-process numpy oracle EXACTLY at every retention tier — 100%
tier-point exact-match rate, bit-level.

Accumulation convention (pinned, documented): per-bucket sums reduce the
ts-sorted segment with numpy's add reduction (pairwise); the cascade reduces
the finer tier's partials in bucket order the same way. The invariant under
test is that DISTRIBUTION cannot change a single bit: any partitioning /
shuffle layout must reproduce the single-process result exactly (the engine
sorts each conversation by ts before reducing — SURVEY.md §7.3.1).
"""

import numpy as np
import pandas as pd

import ray.data as rd

from tslib_ray.sources.transcripts import synth_transcripts_table
from tslib_ray.stages import rollup as R

TIER_US = R.TIER_US


def _numpy_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process reference semantics: per (conv, tier, bucket):
    n = count(non-null), sum = sequential add in (ts) order, min/max,
    mean = sum/n."""
    df = df.sort_values(["conv_id", "ts", "turn_idx"],
                        kind="mergesort").reset_index(drop=True)
    rows = []
    for conv, g in df.groupby("conv_id", sort=False):
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g["value"].to_numpy(dtype=np.float64)
        b1 = ts_us // TIER_US["1m"] * TIER_US["1m"]

        def reduce_by(bucket_arr, sums_in, mins_in, maxs_in, ns_in):
            # convention: np.add/fmin/fmax.reduceat over the bucket-sorted
            # run (the pinned reduction primitive; np.add.reduce blocks
            # differently and is NOT bit-equal)
            order = np.argsort(bucket_arr, kind="stable")
            b = bucket_arr[order]
            idx = np.flatnonzero(np.concatenate(([True], b[1:] != b[:-1])))
            s = np.add.reduceat(np.nan_to_num(sums_in[order], nan=0.0), idx)
            mn = np.fmin.reduceat(mins_in[order], idx)
            mx = np.fmax.reduceat(maxs_in[order], idx)
            n = np.add.reduceat(ns_in[order], idx)
            s = np.where(n > 0, s, np.nan)
            return b[idx], s, mn, mx, n

        nn = (~np.isnan(vals)).astype(np.int64)
        cb, cs, cmn, cmx, cn = reduce_by(b1, vals, vals, vals, nn)
        for tier in ("1m", "1h", "1d"):
            if tier != "1m":
                cb2 = cb // TIER_US[tier] * TIER_US[tier]
                cb, cs, cmn, cmx, cn = reduce_by(cb2, cs, cmn, cmx, cn)
            for i in range(cb.size):
                n = cn[i]
                rows.append((conv, tier, cb[i],
                             cs[i] if n else np.nan,
                             cmn[i] if n else np.nan,
                             cmx[i] if n else np.nan,
                             n, cs[i] / n if n else np.nan))
    return pd.DataFrame(rows, columns=["conv_id", "tier", "bucket_ts",
                                       "sum_value", "min_value", "max_value",
                                       "n", "mean_value"])


def test_tier_points_exact_match_rate_100():
    table = synth_transcripts_table(60, seed=9)
    df = table.to_pandas()
    ds = rd.from_arrow(table.select(["conv_id", "ts", "value"]))
    got = R.value_tiers_per_key(ds, "conv_id", "ts", "value",
                                n_parts=8).to_pandas()
    want = _numpy_oracle(df)

    k = ["conv_id", "tier", "bucket_ts"]
    got["bucket_ts"] = got["bucket_ts"].to_numpy().astype(
        "datetime64[us]").astype(np.int64)
    got = got.sort_values(k, kind="mergesort").reset_index(drop=True)
    want = want.sort_values(k, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    n_cells = 0
    n_match = 0
    for c in ["sum_value", "min_value", "max_value", "n", "mean_value"]:
        a = got[c].to_numpy(dtype=np.float64)
        b = want[c].to_numpy(dtype=np.float64)
        an = np.nan_to_num(a, nan=-1.5)
        bn = np.nan_to_num(b, nan=-1.5)
        eq = an.view(np.uint64) == bn.view(np.uint64)
        n_cells += eq.size
        n_match += int(eq.sum())
    assert (got[k].astype(str).to_numpy()
            == want[k].astype(str).to_numpy()).all()
    match_rate = n_match / n_cells
    assert match_rate == 1.0, f"tier-point exact-match rate {match_rate}"
