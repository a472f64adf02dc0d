"""Session windowing over the event stream (streaming-shaped workload on a
batch engine — ray_guide 'Streaming-shaped workloads'): sessions split when
the gap between consecutive events within a key exceeds ``gap_s``.

Per-key ordering is established *inside* the group UDF (sort by (ts,
event_id)), never assumed across batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def sessionize(events: "rd.Dataset", key: str = "user_id",
               ts_col: str = "ts", order_col: str = "event_id",
               gap_s: float = 1800.0) -> "rd.Dataset":
    """Add ``session_id`` (0-based per key) to each event row."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        gap = g[ts_col].diff().dt.total_seconds()
        new_s = (gap.isna() | (gap > gap_s)).to_numpy()
        g["session_id"] = np.cumsum(new_s).astype(np.int64) - 1
        return g

    return events.groupby(key).map_groups(fn, batch_format="pandas")


def session_stats(events: "rd.Dataset", key: str = "user_id",
                  ts_col: str = "ts", order_col: str = "event_id",
                  gap_s: float = 1800.0) -> "rd.Dataset":
    """Per-key session summary: ``(key, n_sessions, n_events)``."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        gap = g[ts_col].diff().dt.total_seconds()
        n_sessions = int((gap.isna() | (gap > gap_s)).sum())
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_sessions": np.int64(n_sessions),
                             "n_events": np.int64(len(g))})

    return events.groupby(key).map_groups(fn, batch_format="pandas")
