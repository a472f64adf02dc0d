"""Incremental / streaming layer: per-key TSmodel sliding ensembles.

Two execution shapes for the same kernel
(:class:`tslib_ray.kernels.tscascade.TSModelEnsemble`):

- **Batch** (:func:`denoise_per_key`): ``groupby(key).map_groups`` — the
  group UDF sorts by the order column and replays the series through the
  ensemble. Correct at any parallelism; this is the default.
- **Streaming** (:class:`KeyShardedTSModels`): raw Ray actors (the documented
  "last resort" — Dataset stages cannot give per-key cross-batch ordering,
  SURVEY.md §7.3.2), one actor per key-hash shard, fed micro-batches in ts
  order by a driver loop. Actor state is re-derivable by replaying the log
  from the last manifest offset, which keeps retry semantics safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..kernels.tscascade import TSModelEnsemble


def ensemble_denoised(vals: np.ndarray, k: int, L: int, gamma: float,
                      T0: int, rect_factor: int) -> np.ndarray:
    """One series through the sliding TSmodel ensemble; NaN where the
    ensemble has not yet produced a denoised value. Shared by the Ray group
    UDFs and the sequential VALUES-oracle builder (oracles.py) so both
    execute identical math."""
    ens = TSModelEnsemble(k, L, gamma, T0, rect_factor)
    ens.update_model(np.asarray(vals, dtype=np.float64))
    den = ens.denoise_ts()
    out = np.full(len(vals), np.nan)
    out[: den.size] = den
    return out


def denoise_per_key(ds: "rd.Dataset", key: str, order_col: str,
                    value_col: str, k: int = 3, L: int = 20,
                    gamma: float = 0.5, T0: int = 200,
                    rect_factor: int = 5) -> "rd.Dataset":
    """Per-key incremental denoise: rows (key, t, value, denoised)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        vals = g[value_col].to_numpy(dtype=np.float64)
        out = ensemble_denoised(vals, k, L, gamma, T0, rect_factor)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "t": g[order_col].to_numpy(),
            value_col: vals,
            "denoised": out,
        })

    return ds.groupby(key).map_groups(fn, batch_format="pandas")


def denoise_summary_group(g: pd.DataFrame, key: str, order_col: str,
                          value_col: str, k: int, L: int, gamma: float,
                          T0: int, rect_factor: int) -> pd.DataFrame:
    """One key's denoise summary row: (key, n, n_denoised, sum_value,
    sum_denoised) with sums accumulated in series order (deterministic —
    enables the hash-compared sequential oracle)."""
    g = g.sort_values(order_col, kind="mergesort")
    vals = g[value_col].to_numpy(dtype=np.float64)
    den = ensemble_denoised(vals, k, L, gamma, T0, rect_factor)
    r6 = lambda x: np.floor(np.float64(x) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({
        key: g[key].to_numpy()[:1],
        "n": np.array([vals.size], dtype=np.int64),
        "n_denoised": np.array([int(np.isfinite(den).sum())], dtype=np.int64),
        "sum_value": np.array([r6(vals.sum())]),
        "sum_denoised": np.array([r6(np.nansum(den))]),
    })


def denoise_summary_per_key(ds: "rd.Dataset", key: str, order_col: str,
                            value_col: str, k: int = 3, L: int = 20,
                            gamma: float = 0.5, T0: int = 200,
                            rect_factor: int = 5) -> "rd.Dataset":
    """Per-key denoise summary (one row per key) — the oracle-checkable
    surface of the incremental layer."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return denoise_summary_group(g, key, order_col, value_col, k, L,
                                     gamma, T0, rect_factor)

    return ds.groupby(key).map_groups(fn, batch_format="pandas")


@ray.remote
class _ShardActor:
    """One shard's keyed ensembles; processes micro-batches in arrival order."""

    def __init__(self, k: int, L: int, gamma: float, T0: int,
                 rect_factor: int):
        self.params = (k, L, gamma, T0, rect_factor)
        self.models: dict = {}
        self.offsets: dict = {}

    def update(self, keys: np.ndarray, values: np.ndarray) -> int:
        df = pd.DataFrame({"k": keys, "v": values})
        for kk, g in df.groupby("k", sort=True):
            ens = self.models.get(kk)
            if ens is None:
                ens = self.models[kk] = TSModelEnsemble(*self.params)
            ens.update_model(g["v"].to_numpy(dtype=np.float64))
            self.offsets[kk] = self.offsets.get(kk, 0) + len(g)
        return len(df)

    def denoised(self, key) -> np.ndarray:
        ens = self.models.get(key)
        return ens.denoise_ts() if ens is not None else np.empty(0)

    def predict(self, key, last_points, no_models: int = 10) -> float:
        return self.models[key].predict(last_points, no_models)

    def state(self) -> dict:
        return dict(self.offsets)


class KeyShardedTSModels:
    """Driver-side handle: routes each key to ``shard = hash(key) % n`` so one
    actor sees one key's points in order."""

    def __init__(self, n_shards: int = 4, k: int = 3, L: int = 20,
                 gamma: float = 0.5, T0: int = 200, rect_factor: int = 5):
        self.n = n_shards
        self.actors = [_ShardActor.remote(k, L, gamma, T0, rect_factor)
                       for _ in range(n_shards)]

    def _shard(self, key) -> int:
        import zlib
        return zlib.crc32(str(key).encode()) % self.n

    def update_batch(self, keys: np.ndarray, values: np.ndarray) -> None:
        keys = np.asarray(keys)
        values = np.asarray(values, dtype=np.float64)
        shards = np.array([self._shard(k) for k in keys])
        refs = []
        for s in range(self.n):
            sel = shards == s
            if sel.any():
                refs.append(self.actors[s].update.remote(keys[sel],
                                                         values[sel]))
        ray.get(refs)  # barrier per micro-batch preserves per-key order

    def denoised(self, key) -> np.ndarray:
        return ray.get(self.actors[self._shard(key)].denoised.remote(key))

    def predict(self, key, last_points, no_models: int = 10) -> float:
        return ray.get(self.actors[self._shard(key)].predict.remote(
            key, last_points, no_models))

    def offsets(self) -> dict:
        out = {}
        for a in self.actors:
            out.update(ray.get(a.state.remote()))
        return out
