"""Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", public algorithm) — the rank-accurate
companion to the equi-width histogram sketch in :mod:`.sketch`, closing the
documented gap at rollup.py::quantiles_per_key ("switch to a mergeable
sketch — t-digest — when approximate answers are acceptable").

Construction is the DETERMINISTIC vectorized variant of the merging
digest: points (or centroids, when merging) are sorted and clustered by
``floor(k1(q_mid))`` where ``k1(q) = delta/(2*pi) * asin(2q - 1)`` is the
paper's scale function and ``q_mid`` the midpoint rank of each point.
Every cluster spans <= 1 unit in k-space, so cluster sizes shrink toward
the tails (the property that makes p99 accurate) and the rank error per
cluster is bounded by ``W * max_dq(k)``. Given the same multiset of
weighted points the output is bit-reproducible — no insertion-order
dependence, unlike the classical streaming construction — which is what
lets the driver hash-compare the distributed result against a sequential
oracle (pipelines/oracles.py protocol).

Composability: a digest is a set of ``(mean, weight)`` rows per
``(key, bucket_ts)``. Digests merge by re-clustering the union of their
centroids as weighted points (:func:`tdigest_merge`), so tier cascades
(1m -> 1h -> 1d) ride the SAME long-row shuffle discipline as the rollup
partials: re-floor ``bucket_ts``, one narrow hash exchange, vectorized
re-cluster per partition. Cascaded estimates are NOT bit-identical to
direct-from-raw ones (approximation composes), but the rank-error bound
holds — tested with an explicit tolerance, unlike the histogram sketch
whose cascade is exact.

Scale notes: the raw-data path shuffles (key, bucket, value) triples once
(24 B/row, same as quantiles_per_key); the sketch path shuffles only
centroid rows — O(delta) per (key, bucket) regardless of input size. All
per-partition work is lexsort + reduceat over EVERY group at once; no
per-group Python.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .rollup import TIER_UNIT, _add_part, _dict_encode, floor_bucket


# ---------------------------------------------------------------------------
# pure single-group kernels (shared by the sequential oracle builder)
# ---------------------------------------------------------------------------

def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * np.pi)) * np.arcsin(
        np.clip(2.0 * q - 1.0, -1.0, 1.0))


def tdigest_from_sorted(x: np.ndarray, w: np.ndarray,
                        delta: float = 100.0) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """Digest of ONE group from value-sorted weighted points: cluster by
    ``floor(k1(q_mid) + delta/4)`` (shift keeps the index non-negative),
    weighted mean per cluster. Returns (means, weights), means ascending."""
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    if x.size == 0:
        return x, w
    total = w.sum()
    qmid = (np.cumsum(w) - 0.5 * w) / total
    kidx = np.floor(_k1(qmid, delta) + delta / 4.0).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, kidx[1:] != kidx[:-1]])
    cw = np.add.reduceat(w, starts)
    cm = np.add.reduceat(x * w, starts) / cw
    return cm, cw


def tdigest_merge(m1: np.ndarray, w1: np.ndarray, m2: np.ndarray,
                  w2: np.ndarray, delta: float = 100.0
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Merge two digests: re-cluster the centroid union as weighted points
    (sorted by (mean, weight) for determinism under ties)."""
    m = np.concatenate([np.asarray(m1, np.float64),
                        np.asarray(m2, np.float64)])
    w = np.concatenate([np.asarray(w1, np.float64),
                        np.asarray(w2, np.float64)])
    order = np.lexsort((w, m))
    return tdigest_from_sorted(m[order], w[order], delta)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     qs: Sequence[float]) -> np.ndarray:
    """Quantile estimates: linear interpolation between centroid midpoint
    ranks (the standard estimator; clamps to the end centroids' means).
    Same float-op order as the vectorized multi-group path, so the
    sequential oracle and the distributed estimate agree bit-for-bit
    (np.interp's y0 + slope*(t-x0) rounds differently in the last ulp)."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return np.full(len(list(qs)), np.nan)
    cum = np.cumsum(weights)
    mid = cum - 0.5 * weights
    t = np.asarray(qs, dtype=np.float64) * cum[-1]
    hi = np.clip(np.searchsorted(mid, t, side="left"), 0, mid.size - 1)
    lo = np.clip(hi - 1, 0, mid.size - 1)
    span = mid[hi] - mid[lo]
    frac = np.where(span > 0,
                    (t - mid[lo]) / np.where(span > 0, span, 1.0), 0.0)
    frac = np.clip(frac, 0.0, 1.0)
    return means[lo] + (means[hi] - means[lo]) * frac


# ---------------------------------------------------------------------------
# vectorized multi-group core (one partition, all groups at once)
# ---------------------------------------------------------------------------

def _cluster_all_groups(gid: np.ndarray, x: np.ndarray, w: np.ndarray,
                        delta: float):
    """Cluster rows sorted by (gid, x[, w]) into per-group digest centroids
    in one reduceat pass. Returns (cluster_gid, means, weights) with
    clusters ascending by mean inside each gid."""
    newg = np.r_[True, gid[1:] != gid[:-1]]
    gstarts = np.flatnonzero(newg)
    seg = np.cumsum(newg) - 1
    totals = np.add.reduceat(w, gstarts)
    cumw = np.cumsum(w)
    base = (np.r_[0.0, cumw[gstarts[1:] - 1]])[seg]
    qmid = (cumw - base - 0.5 * w) / totals[seg]
    kidx = np.floor(_k1(qmid, delta) + delta / 4.0).astype(np.int64)
    newc = np.r_[True, (gid[1:] != gid[:-1]) | (kidx[1:] != kidx[:-1])]
    cstarts = np.flatnonzero(newc)
    cw = np.add.reduceat(w, cstarts)
    cm = np.add.reduceat(x * w, cstarts) / cw
    return gid[cstarts], cm, cw


def _quantiles_all_groups(cgid: np.ndarray, cm: np.ndarray, cw: np.ndarray,
                          qs: np.ndarray):
    """Per-group quantile estimates from clustered centroids (rows sorted
    by (cgid, mean)): np.interp semantics per group, fully vectorized via a
    globally monotone cumulative-midpoint axis. Returns (group_gids,
    (len(qs) x n_groups) estimates)."""
    newg = np.r_[True, cgid[1:] != cgid[:-1]]
    gstarts = np.flatnonzero(newg)
    gends = np.r_[gstarts[1:], cgid.size]
    seg = np.cumsum(newg) - 1
    cum = np.cumsum(cw)
    gbase = np.r_[0.0, cum[gstarts[1:] - 1]]  # weight before each group
    # group-LOCAL midpoint ranks: for count weights these are exact
    # integers +- 0.5, so every comparison and subtraction below performs
    # the IDENTICAL float ops as the single-group kernel — bit-equal
    # results (the oracle-parity contract); a global monotone axis would
    # round (gbase + q*totals) differently in the last ulp
    mid = (cum - gbase[seg]) - 0.5 * cw
    totals = np.add.reduceat(cw, gstarts)
    rows = np.arange(cgid.size)
    out = np.empty((len(qs), gstarts.size), dtype=np.float64)
    for qi, q in enumerate(qs):
        t = q * totals
        # first row of each group whose mid >= t (== searchsorted left),
        # vectorized with a min-reduceat over hit row indices
        hit = mid >= t[seg]
        idx = np.where(hit, rows, cgid.size)
        hi = np.minimum(np.minimum.reduceat(idx, gstarts), gends - 1)
        lo = np.maximum(hi - 1, gstarts)
        span = mid[hi] - mid[lo]
        frac = np.where(span > 0,
                        (t - mid[lo]) / np.where(span > 0, span, 1.0),
                        0.0)
        frac = np.clip(frac, 0.0, 1.0)
        out[qi] = cm[lo] + (cm[hi] - cm[lo]) * frac
    return cgid[gstarts], out


# ---------------------------------------------------------------------------
# Dataset stages
# ---------------------------------------------------------------------------

def _sorted_group_arrays(t: pa.Table, key: str, value_col: str,
                         ts_is_bucket: bool, ts_col: str, tier: str | None,
                         w_col: str | None):
    """Common prep: dict-encode the key, floor the bucket, lexsort by
    (key-code, bucket, value[, weight]); returns sorted arrays + uniques."""
    if ts_is_bucket:
        bucket = t[ts_col]
        if tier is not None:
            bucket = floor_bucket(bucket, tier)
    else:
        bucket = floor_bucket(t[ts_col], tier)
    codes, uniques = _dict_encode(t[key])
    ts_us = bucket.to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    w = (t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
         if w_col else np.ones(v.size, dtype=np.float64))
    order = np.lexsort((w, v, ts_us, codes))
    # composite group id: dense codes are < 2**31 (bounded by partition
    # rows) and bucket ids are re-coded densely too, so the pack is exact
    ub, bcode = np.unique(ts_us, return_inverse=True)
    gid = codes[order] * np.int64(max(ub.size, 1)) + bcode[order]
    return gid, v[order], w[order], ts_us[order], codes[order], uniques


def _empty_quantile_table(key: str, names: Sequence[str],
                          uniques) -> pa.Table:
    cols = {key: uniques.take(pa.array([], type=pa.int64())),
            "bucket_ts": pa.array([], type=pa.timestamp("us"))}
    for nm in names:
        cols[nm] = pa.array([], type=pa.float64())
    return pa.table(cols)


def _with_schema_anchor(out: "rd.Dataset", ds: "rd.Dataset", key: str,
                        value_names: Sequence[str]) -> "rd.Dataset":
    """``groupby().map_groups()`` over a fully EMPTY Dataset yields zero
    blocks and loses the output schema (per-partition empty handling never
    runs because there are no groups). Union one typed empty block in
    front so ``Dataset.schema()`` and arrow consumers always see
    (key, bucket_ts, values...) even for zero-row inputs. NOTE Ray's
    ``to_pandas()`` returns a column-less frame for ANY zero-row Dataset
    (even a plain typed ``from_arrow``) — the schema contract lives at the
    Arrow level. The key's Arrow type is read from the input Dataset's
    metadata schema."""
    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key]
    cols = {key: pa.array([], type=key_type),
            "bucket_ts": pa.array([], type=pa.timestamp("us"))}
    for nm in value_names:
        cols[nm] = pa.array([], type=pa.float64())
    return rd.from_arrow(pa.table(cols)).union(out)


def tdigest_quantiles_per_key(ds: "rd.Dataset", key: str, ts_col: str,
                              value_col: str, tier: str,
                              qs: Sequence[float] = (0.5, 0.95, 0.99),
                              names: Sequence[str] | None = None,
                              delta: float = 100.0,
                              n_parts: int = 64) -> "rd.Dataset":
    """Per-(key, tier-bucket) t-digest quantile estimates straight from raw
    points: ONE narrow hash shuffle co-locates each group, then every group
    of a partition is digested + estimated in one vectorized pass.
    Deterministic (group content decides, partitioning does not)."""
    assert tier in TIER_UNIT, tier
    names = list(names or [f"p{round(q * 100)}" for q in qs])
    qs_arr = np.asarray(qs, dtype=np.float64)
    parted = _add_part(ds.select_columns([key, ts_col, value_col]),
                       key, n_parts)

    def part_fn(t: pa.Table) -> pa.Table:
        gid, v, w, ts_us, codes, uniques = _sorted_group_arrays(
            t, key, value_col, False, ts_col, tier, None)
        if gid.size == 0:
            return _empty_quantile_table(key, names, uniques)
        cgid, cm, cw = _cluster_all_groups(gid, v, w, delta)
        ggid, est = _quantiles_all_groups(cgid, cm, cw, qs_arr)
        # map composite gids back to (key, bucket)
        newg = np.r_[True, gid[1:] != gid[:-1]]
        gfirst = np.flatnonzero(newg)
        cols = {key: pc.take(uniques, pa.array(codes[gfirst])),
                "bucket_ts": pa.array(ts_us[gfirst],
                                      type=pa.timestamp("us"))}
        for i, nm in enumerate(names):
            cols[nm] = pa.array(est[i], type=pa.float64())
        return pa.table(cols)

    out = parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _with_schema_anchor(out, ds, key, names)


def tdigest_tier(ds: "rd.Dataset", key: str, ts_col: str, value_col: str,
                 tier: str, delta: float = 100.0,
                 n_parts: int = 64) -> "rd.Dataset":
    """Materialize the SKETCH itself as long rows ``(key, bucket_ts, mean,
    weight)`` — O(delta) rows per group, the mergeable representation the
    cascade and downstream estimators consume."""
    assert tier in TIER_UNIT, tier
    parted = _add_part(ds.select_columns([key, ts_col, value_col]),
                       key, n_parts)

    def part_fn(t: pa.Table) -> pa.Table:
        gid, v, w, ts_us, codes, uniques = _sorted_group_arrays(
            t, key, value_col, False, ts_col, tier, None)
        if gid.size == 0:
            return pa.table({
                key: uniques.take(pa.array([], type=pa.int64())),
                "bucket_ts": pa.array([], type=pa.timestamp("us")),
                "mean": pa.array([], type=pa.float64()),
                "weight": pa.array([], type=pa.float64())})
        cgid, cm, cw = _cluster_all_groups(gid, v, w, delta)
        # recover (key, bucket) of each cluster from the first row of its
        # group: clusters inherit positions via searchsorted on group ids
        newg = np.r_[True, gid[1:] != gid[:-1]]
        gfirst = np.flatnonzero(newg)
        gids_u = gid[gfirst]
        at = np.searchsorted(gids_u, cgid)
        return pa.table({
            key: pc.take(uniques, pa.array(codes[gfirst][at])),
            "bucket_ts": pa.array(ts_us[gfirst][at],
                                  type=pa.timestamp("us")),
            "mean": pa.array(cm, type=pa.float64()),
            "weight": pa.array(cw, type=pa.float64())})

    out = parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _with_schema_anchor(out, ds, key, ["mean", "weight"])


def tdigest_cascade(sketch: "rd.Dataset", key: str, coarser: str,
                    delta: float = 100.0,
                    n_parts: int = 64) -> "rd.Dataset":
    """Coarsen a digest sketch WITHOUT touching raw data: re-floor
    ``bucket_ts``, one narrow exchange of centroid rows, re-cluster the
    centroid union per (key, coarser bucket) — the t-digest merge, run for
    every group of a partition at once."""
    assert coarser in TIER_UNIT, coarser
    parted = _add_part(sketch, key, n_parts)

    def part_fn(t: pa.Table) -> pa.Table:
        gid, v, w, ts_us, codes, uniques = _sorted_group_arrays(
            t, key, "mean", True, "bucket_ts", coarser, "weight")
        if gid.size == 0:
            return pa.table({
                key: uniques.take(pa.array([], type=pa.int64())),
                "bucket_ts": pa.array([], type=pa.timestamp("us")),
                "mean": pa.array([], type=pa.float64()),
                "weight": pa.array([], type=pa.float64())})
        cgid, cm, cw = _cluster_all_groups(gid, v, w, delta)
        newg = np.r_[True, gid[1:] != gid[:-1]]
        gfirst = np.flatnonzero(newg)
        at = np.searchsorted(gid[gfirst], cgid)
        return pa.table({
            key: pc.take(uniques, pa.array(codes[gfirst][at])),
            "bucket_ts": pa.array(ts_us[gfirst][at],
                                  type=pa.timestamp("us")),
            "mean": pa.array(cm, type=pa.float64()),
            "weight": pa.array(cw, type=pa.float64())})

    out = parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _with_schema_anchor(out, sketch, key, ["mean", "weight"])


def tdigest_cascade_quantiles(ds: "rd.Dataset", key: str, ts_col: str,
                              value_col: str, fine: str, coarse: str,
                              qs: Sequence[float] = (0.5, 0.95, 0.99),
                              names: Sequence[str] | None = None,
                              delta: float = 100.0,
                              n_parts: int = 64) -> "rd.Dataset":
    """Single-exchange plan for ``tier(fine) -> cascade(coarse) ->
    quantiles`` when ONE job owns the whole chain: all three staged
    functions hash-partition on the SAME key, so their per-partition
    kernels compose in one partition visit — output bit-identical to the
    staged ``tdigest_tier |> tdigest_cascade |>
    tdigest_quantiles_from_sketch`` (tested), at one all-to-all instead of
    three. The staged functions remain the cross-job path, where coarser
    tiers are maintained from PERSISTED finer sketches instead of raw
    points."""
    assert fine in TIER_UNIT and coarse in TIER_UNIT
    names = list(names or [f"p{round(q * 100)}" for q in qs])
    qs_arr = np.asarray(qs, dtype=np.float64)
    parted = _add_part(ds.select_columns([key, ts_col, value_col]),
                       key, n_parts)

    def sketch_rows(gid, ts_us, codes, uniques, cgid, cm, cw) -> pa.Table:
        newg = np.r_[True, gid[1:] != gid[:-1]]
        gfirst = np.flatnonzero(newg)
        at = np.searchsorted(gid[gfirst], cgid)
        return pa.table({
            key: pc.take(uniques, pa.array(codes[gfirst][at])),
            "bucket_ts": pa.array(ts_us[gfirst][at],
                                  type=pa.timestamp("us")),
            "mean": pa.array(cm, type=pa.float64()),
            "weight": pa.array(cw, type=pa.float64())})

    def part_fn(t: pa.Table) -> pa.Table:
        # fine-tier digest (the tdigest_tier kernel)
        gid, v, w, ts_us, codes, uniques = _sorted_group_arrays(
            t, key, value_col, False, ts_col, fine, None)
        if gid.size == 0:
            return _empty_quantile_table(key, names, uniques)
        sk = sketch_rows(gid, ts_us, codes, uniques,
                         *_cluster_all_groups(gid, v, w, delta))
        # cascade to the coarse tier (the tdigest_cascade kernel)
        gid2, v2, w2, ts2, codes2, uniq2 = _sorted_group_arrays(
            sk, key, "mean", True, "bucket_ts", coarse, "weight")
        sk2 = sketch_rows(gid2, ts2, codes2, uniq2,
                          *_cluster_all_groups(gid2, v2, w2, delta))
        # estimate (the tdigest_quantiles_from_sketch kernel)
        gid3, v3, w3, ts3, codes3, uniq3 = _sorted_group_arrays(
            sk2, key, "mean", True, "bucket_ts", None, "weight")
        ggid, est = _quantiles_all_groups(gid3, v3, w3, qs_arr)
        newg = np.r_[True, gid3[1:] != gid3[:-1]]
        gfirst = np.flatnonzero(newg)
        cols = {key: pc.take(uniq3, pa.array(codes3[gfirst])),
                "bucket_ts": pa.array(ts3[gfirst],
                                      type=pa.timestamp("us"))}
        for i, nm in enumerate(names):
            cols[nm] = pa.array(est[i], type=pa.float64())
        return pa.table(cols)

    out = parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _with_schema_anchor(out, ds, key, names)


def tdigest_quantiles_from_sketch(sketch: "rd.Dataset", key: str,
                                  qs: Sequence[float] = (0.5, 0.95, 0.99),
                                  names: Sequence[str] | None = None,
                                  n_parts: int = 64) -> "rd.Dataset":
    """Quantile estimates from digest rows (no raw data): sort each
    partition's centroids by (key, bucket, mean) and interpolate."""
    names = list(names or [f"p{round(q * 100)}" for q in qs])
    qs_arr = np.asarray(qs, dtype=np.float64)
    parted = _add_part(sketch, key, n_parts)

    def part_fn(t: pa.Table) -> pa.Table:
        gid, v, w, ts_us, codes, uniques = _sorted_group_arrays(
            t, key, "mean", True, "bucket_ts", None, "weight")
        if gid.size == 0:
            return _empty_quantile_table(key, names, uniques)
        ggid, est = _quantiles_all_groups(gid, v, w, qs_arr)
        newg = np.r_[True, gid[1:] != gid[:-1]]
        gfirst = np.flatnonzero(newg)
        cols = {key: pc.take(uniques, pa.array(codes[gfirst])),
                "bucket_ts": pa.array(ts_us[gfirst],
                                      type=pa.timestamp("us"))}
        for i, nm in enumerate(names):
            cols[nm] = pa.array(est[i], type=pa.float64())
        return pa.table(cols)

    out = parted.groupby("_part").map_groups(
        lambda g: part_fn(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _with_schema_anchor(out, sketch, key, names)
