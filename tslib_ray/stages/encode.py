"""Gorilla tile encoding as a stateful actor-pool ``map_batches`` stage.

Input: tier points (or gap-filled points) already grouped per key via
``groupby(keys).map_groups`` upstream — this stage re-groups *within each
batch* (cheap: batches arrive key-clustered from the upstream shuffle) and
emits one tile row per (keys..., tile) with Gorilla-compressed blobs:

    keys..., tier:string, tile_start_ts:timestamp[us], n_points:int64,
    ts_blob:binary, val_blob:binary

The codec object is built once per actor (``__init__``), batches are Arrow
end-to-end (binary columns stay out of pandas object dtype — ray_guide
pitfalls), and each output row is a pure function of its input rows so Ray's
task retry stays safe (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..kernels import gorilla

TILE_SCHEMA_TAIL = [
    ("tier", pa.string()),
    ("tile_start_ts", pa.timestamp("us")),
    ("n_points", pa.int64()),
    ("ts_blob", pa.binary()),
    ("val_blob", pa.binary()),
]


class GorillaEncoder:
    """Actor-pool stage: per-key Gorilla tiles from point batches."""

    def __init__(self, keys: list[str], tier: str, ts_col: str = "bucket_ts",
                 value_col: str = "mean_value", max_points_per_tile: int = 4096):
        self.keys = list(keys)
        self.tier = tier
        self.ts_col = ts_col
        self.value_col = value_col
        self.max_points = int(max_points_per_tile)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.sort_by([(k, "ascending") for k in self.keys]
                              + [(self.ts_col, "ascending")])
        ts = batch[self.ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = batch[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)

        # group boundaries within the batch (keys arrive clustered)
        key_arrays = [batch[k] for k in self.keys]
        n = len(batch)
        boundary = np.zeros(n, dtype=bool)
        boundary[0] = True
        for arr in key_arrays:
            col = arr.to_numpy(zero_copy_only=False)
            boundary[1:] |= col[1:] != col[:-1]
        group_starts = np.flatnonzero(boundary)
        group_ends = np.append(group_starts[1:], n)

        # tile boundaries: per-group max_points strides; key columns fan out
        # via ONE take on the tile-start indices (no per-tile .as_py())
        if group_starts.size:
            per_group = [np.arange(s, e, self.max_points)
                         for s, e in zip(group_starts, group_ends)]
            tile_starts = np.concatenate(per_group)
            tile_ends = np.minimum(
                tile_starts + self.max_points,
                np.repeat(group_ends, [len(x) for x in per_group]))
        else:
            tile_starts = tile_ends = np.empty(0, dtype=np.int64)

        tsb_l, vb_l = [], []
        for lo, hi in zip(tile_starts, tile_ends):
            ts_blob, val_blob = gorilla.encode_tile(ts[lo:hi], vals[lo:hi])
            tsb_l.append(ts_blob)
            vb_l.append(val_blob)

        idx = pa.array(tile_starts, type=pa.int64())
        cols = {k: pc.take(arr, idx)
                for k, arr in zip(self.keys, key_arrays)}
        cols["tier"] = pa.array([self.tier] * len(tile_starts),
                                type=pa.string())
        cols["tile_start_ts"] = pa.array(ts[tile_starts],
                                         type=pa.timestamp("us"))
        cols["n_points"] = pa.array(tile_ends - tile_starts, type=pa.int64())
        cols["ts_blob"] = pa.array(tsb_l, type=pa.binary())
        cols["val_blob"] = pa.array(vb_l, type=pa.binary())
        return pa.table(cols)


def encode_tiles(points: "rd.Dataset", keys, tier: str,
                 ts_col: str = "bucket_ts", value_col: str = "mean_value",
                 concurrency: int = 4, batch_size: int = 32768,
                 max_points_per_tile: int = 4096,
                 use_actors: bool = False) -> "rd.Dataset":
    """Gorilla-encode tier points into per-key tiles.

    Callers must ensure each key's points are clustered (output of a
    ``groupby(keys)`` stage already is); a key whose points span batch
    boundaries yields multiple valid tiles rather than corrupt ones —
    decode-concatenation reconstructs the full series either way.

    The Gorilla codec holds no trained state, so the default is stateless
    map tasks (elastic, no pool-spinup latency). ``use_actors=True`` switches
    to an actor pool — the shape a codec with per-actor setup cost (trained
    dictionaries, loaded models) needs; pool size is clamped below the
    cluster CPU count so producers can't starve.
    """
    keys = list(keys)
    if not use_actors:
        enc = GorillaEncoder(keys=keys, tier=tier, ts_col=ts_col,
                             value_col=value_col,
                             max_points_per_tile=max_points_per_tile)
        return points.map_batches(enc, batch_format="pyarrow",
                                  batch_size=batch_size)
    try:
        import ray
        avail = int(ray.cluster_resources().get("CPU", concurrency + 1))
        concurrency = max(1, min(concurrency, avail - 1))
    except Exception:
        pass
    return points.map_batches(
        GorillaEncoder,
        fn_constructor_kwargs=dict(keys=keys, tier=tier, ts_col=ts_col,
                                   value_col=value_col,
                                   max_points_per_tile=max_points_per_tile),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def encode_tiles_grouped(points: "rd.Dataset", keys, tier: str,
                         ts_col: str = "bucket_ts",
                         value_col: str = "mean_value", n_parts: int = 64,
                         max_points_per_tile: int = 4096) -> "rd.Dataset":
    """Whole-key tile encoding: one hash-bucket shuffle co-locates ALL of a
    key's points in a single partition UDF call, so every key yields exactly
    ``ceil(n_points / max_points_per_tile)`` tiles — which makes tile counts
    and boundaries predictable (and SQL-oracle-checkable, unlike the
    streaming :func:`encode_tiles` where a key crossing a block boundary
    yields extra, still-valid tiles)."""
    from .rollup import _add_part

    keys = list(keys)
    enc = GorillaEncoder(keys=keys, tier=tier, ts_col=ts_col,
                         value_col=value_col,
                         max_points_per_tile=max_points_per_tile)
    parted = _add_part(points.select_columns(keys + [ts_col, value_col]),
                       keys[0], n_parts)
    return parted.groupby("_part").map_groups(
        lambda g: enc(g.drop_columns(["_part"])), batch_format="pyarrow")


def decode_tiles_to_points(tiles: "rd.Dataset", keys,
                           value_col: str = "mean_value") -> "rd.Dataset":
    """Inverse stage (read path): tiles -> points."""
    keys = list(keys)

    def fn(batch: pa.Table) -> pa.Table:
        # one C-level pass per blob column; per-TILE decode loop with fully
        # vectorized per-tile kernels (gorilla.py); key columns fan out via
        # a single take on repeated indices — no per-row .as_py()
        ts_blobs = batch["ts_blob"].to_pylist()
        val_blobs = batch["val_blob"].to_pylist()
        counts = batch["n_points"].to_numpy() if "n_points" in batch.column_names \
            else None
        ts_all, val_all, lens = [], [], []
        for tb, vb in zip(ts_blobs, val_blobs):
            ts, vals = gorilla.decode_tile(tb, vb)
            ts_all.append(ts)
            val_all.append(vals)
            lens.append(len(ts))
        lens = np.asarray(lens, dtype=np.int64)
        ts_cat = (np.concatenate(ts_all) if ts_all
                  else np.empty(0, dtype=np.int64))
        val_cat = np.concatenate(val_all) if val_all else np.empty(0)
        row_idx = np.repeat(np.arange(len(batch)), lens)
        cols = {k: pc.take(batch[k], pa.array(row_idx)) for k in keys}
        cols["bucket_ts"] = pa.array(ts_cat, type=pa.timestamp("us"))
        cols[value_col] = pa.array(val_cat, type=pa.float64())
        return pa.table(cols)

    return tiles.map_batches(fn, batch_format="pyarrow")
