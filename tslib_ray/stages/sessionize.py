"""Session windowing over the event stream (streaming-shaped workload on a
batch engine — ray_guide 'Streaming-shaped workloads'): sessions split when
the gap between consecutive events within a key exceeds ``gap_s``.

Per-key ordering is established *inside* the partition UDF (sort by (key, ts,
order)), never assumed across batches; the windowing itself is vectorized
across every key in a hash partition (per-key map_groups pays per-group
Python overhead — see stages/rollup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .rollup import _add_part


def _session_ids(g: pd.DataFrame, key: str, ts_col: str, order_col: str,
                 gap_s: float):
    """Sorted frame + per-row 0-based session id, vectorized across keys."""
    g = g.sort_values([key, ts_col, order_col], kind="mergesort")
    kv = g[key].to_numpy()
    n = len(g)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = kv[1:] != kv[:-1]
    gap = g[ts_col].diff().dt.total_seconds().to_numpy()
    new_s = first | (gap > gap_s)
    # per-key session counter: global cumsum of starts minus the cumsum
    # value at each key's first row
    cum = np.cumsum(new_s)
    base = np.maximum.accumulate(np.where(first, cum - 1, 0))
    return g, (cum - 1 - base).astype(np.int64), first, new_s


def sessionize(events: "rd.Dataset", key: str = "user_id",
               ts_col: str = "ts", order_col: str = "event_id",
               gap_s: float = 1800.0, n_parts: int = 64) -> "rd.Dataset":
    """Add ``session_id`` (0-based per key) to each event row."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g, sid, _first, _new = _session_ids(g, key, ts_col, order_col, gap_s)
        g = g.copy()
        g["session_id"] = sid
        return g

    parted = _add_part(events, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda g: fn(g.drop(columns=["_part"])), batch_format="pandas")


def session_stats(events: "rd.Dataset", key: str = "user_id",
                  ts_col: str = "ts", order_col: str = "event_id",
                  gap_s: float = 1800.0, n_parts: int = 64) -> "rd.Dataset":
    """Per-key session summary: ``(key, n_sessions, n_events)``."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g, _sid, first, new_s = _session_ids(g, key, ts_col, order_col, gap_s)
        kv = g[key].to_numpy()
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        n_sessions = np.add.reduceat(new_s.astype(np.int64), starts)
        return pd.DataFrame({key: kv[starts],
                             "n_sessions": n_sessions,
                             "n_events": ends - starts})

    parted = _add_part(events, key, n_parts)
    return parted.groupby("_part").map_groups(
        lambda g: fn(g.drop(columns=["_part"])), batch_format="pandas")
