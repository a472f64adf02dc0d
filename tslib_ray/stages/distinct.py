"""Mergeable HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet,
Meunier 2007) — the cardinality continuous aggregate the rollup cascade
cannot provide exactly without shipping every item through the shuffle.

Representation: per ``(key, bucket_ts)`` the non-empty registers of a
2**p-register HLL, stored LONG — one ``(key, bucket_ts, reg, rho)`` row per
register, where ``reg`` is the top ``p`` bits of the 64-bit item hash and
``rho`` is 1 + the number of leading zeros of the remaining ``64 - p`` bits.
Long register rows are composable partials under plain ``max``:

- map side hashes each block's UNIQUE items once (vocab-bounded md5, the
  :func:`~tslib_ray.stages.dedup._md5_token_hashes` basis) and collapses to
  per-register maxima with ``pyarrow.Table.group_by``;
- ONE hash shuffle merges partials per ``(key, bucket_ts, reg)`` — ``max``
  is idempotent/commutative, so the merged sketch is bit-identical
  regardless of arrival order (unlike float sums);
- the tier cascade re-floors ``bucket_ts`` and re-merges the SAME rows —
  a day sketch built from hour sketches equals the day sketch built from
  raw (tested), which is what lets a retention engine keep only coarse
  sketches for old data;
- :func:`hll_estimate` turns register rows into the standard bias-corrected
  estimate (relative error ~1.04/sqrt(2**p)).

The md5 basis makes the whole sketch SQL-mirrorable: DuckDB's
``md5_number_lower(x)::UBIGINT`` equals digest bytes [8:16] little-endian,
``hv >> (64-p)`` is the register, and the leading-zero count of the low
``64-p`` bits is ``(64-p) + 1 - length(bin(w))`` (with a ``w = 0`` guard,
since ``bin(0) = '0'``) — so the driver checks the *exact register rows*,
not a tolerance band. Reference-parity note: tslib has no sketch layer;
this is part of the continuous-aggregate surface the north rule adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import _md5_token_hashes
from .rollup import TIER_UNIT, _add_part, floor_bucket

_U64 = np.uint64


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 (0 -> 0): smear the MSB right,
    then SWAR popcount — no float log2 (inexact above 2**53)."""
    x = w.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> _U64(s)
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def hll_rows(items: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(reg, rho) per item string — md5-based so the SQL mirror is exact."""
    codes, uniques = pd.factorize(items)
    hv = _md5_token_hashes(np.asarray(uniques, dtype=object))[codes]
    reg = (hv >> _U64(64 - p)).astype(np.int32)
    w = hv & _U64((1 << (64 - p)) - 1)
    rho = ((64 - p) + 1 - _bit_length_u64(w)).astype(np.int32)
    return reg, rho


def hll_tier(ds: "rd.Dataset", key: str, ts_col: str, item_col: str,
             tier: str, p: int = 10, n_parts: int = 64) -> "rd.Dataset":
    """Per-(key, tier-bucket) HLL register rows ``(key, bucket_ts, reg,
    rho)`` — map-side partial maxima, one hash shuffle, C-speed merge."""
    assert 4 <= p <= 16, p

    def partial(b: pa.Table) -> pa.Table:
        items = b[item_col].cast(pa.string()).to_numpy(zero_copy_only=False)
        reg, rho = hll_rows(items, p)
        t = pa.table({key: b[key], "bucket_ts": floor_bucket(b[ts_col], tier),
                      "reg": pa.array(reg), "rho": pa.array(rho)})
        out = t.group_by([key, "bucket_ts", "reg"]).aggregate([("rho", "max")])
        return out.rename_columns([key, "bucket_ts", "reg", "rho"])

    partials = ds.select_columns([key, ts_col, item_col]).map_batches(
        partial, batch_format="pyarrow")
    return merge_hll_partials(partials, key, n_parts=n_parts)


def merge_hll_partials(partials: "rd.Dataset", key: str,
                       n_parts: int = 64) -> "rd.Dataset":
    """Max partial rows per (key, bucket_ts, reg): one stable hash-bucket
    shuffle on the key, then a C-speed group_by per partition. ``max`` is
    order-insensitive, so the result is deterministic without the
    sorted-reduceat machinery float sums need."""

    def merge_part(t: pa.Table) -> pa.Table:
        out = t.drop_columns(["_part"]).group_by(
            [key, "bucket_ts", "reg"]).aggregate([("rho", "max")])
        return out.rename_columns([key, "bucket_ts", "reg", "rho"])

    parted = _add_part(partials, key, n_parts)
    return parted.groupby("_part").map_groups(merge_part,
                                              batch_format="pyarrow")


def hll_cascade(sketch: "rd.Dataset", key: str, coarser: str,
                n_parts: int = 64) -> "rd.Dataset":
    """Coarsen a sketch WITHOUT re-reading raw data: re-floor ``bucket_ts``
    and re-merge — register maxima compose exactly (tested bit-identical to
    sketching the coarser tier from raw)."""
    assert coarser in TIER_UNIT, coarser

    def rebucket(b: pa.Table) -> pa.Table:
        i = b.column_names.index("bucket_ts")
        return b.set_column(i, "bucket_ts",
                            floor_bucket(b["bucket_ts"], coarser))

    return merge_hll_partials(
        sketch.map_batches(rebucket, batch_format="pyarrow"), key,
        n_parts=n_parts)


def hll_estimate(sketch: "rd.Dataset", key: str, p: int = 10,
                 n_parts: int = 64) -> "rd.Dataset":
    """Bias-corrected HLL estimate per (key, bucket_ts) from register rows:
    alpha_m * m**2 / sum(2**-rho) with the small-range linear-counting
    correction (Flajolet et al. 2007, fig. 3). All groups of a partition in
    one lexsort + reduceat pass."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))

    def part_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        from .rollup import _dict_encode
        codes, uniques = _dict_encode(t[key])
        if codes.size == 0:
            return pa.table({key: uniques.take(pa.array([], type=pa.int64())),
                             "bucket_ts": pa.array([], type=pa.timestamp("us")),
                             "n_distinct": pa.array([], type=pa.float64())})
        ts_us = t["bucket_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        rho = t["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts_us, codes))
        c, b, rho = codes[order], ts_us[order], rho[order]
        newseg = np.concatenate(([True], (c[1:] != c[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(newseg)
        counts = np.diff(np.append(starts, c.size))
        inv_sum = np.add.reduceat(np.ldexp(1.0, -rho), starts)
        # registers absent from the rows are zero: each contributes 2**0 = 1
        zeros = m - counts
        raw = alpha * m * m / (inv_sum + zeros)
        est = np.where((raw <= 2.5 * m) & (zeros > 0),
                       m * np.log(m / np.maximum(zeros, 1)), raw)
        return pa.table({key: pc.take(uniques, pa.array(c[starts])),
                         "bucket_ts": pa.array(b[starts],
                                               type=pa.timestamp("us")),
                         "n_distinct": pa.array(est, type=pa.float64())})

    parted = _add_part(sketch, key, n_parts)
    return parted.groupby("_part").map_groups(part_fn,
                                              batch_format="pyarrow")


def sliding_distinct(ds: "rd.Dataset", ts_col: str, item_col: str,
                     window_us: int, slide_us: int,
                     n_parts: int = 64) -> "rd.Dataset":
    """EXACT distinct ``item_col`` count per sliding window of length
    ``window_us`` advancing every ``slide_us`` (``window_us`` must be a
    multiple of ``slide_us``): ``(window_start, n_distinct)`` for every
    window with at least one event.

    Ray-Data plan: map-side fan-out of each row to its ``window/slide``
    overlapping windows with an in-batch ``(window, item)`` dedup (bounds
    the shuffle to unique pairs per block), ONE hash shuffle on
    ``window_start``, then a per-partition lexsort + boundary-count. The
    fan-out factor is the overlap count (4 for 1h/15m) — the standard
    cost of exact sliding distinct; the HLL path (:func:`hll_tier`) is the
    sketched alternative when the fan-out or pair volume is too hot.
    """
    assert window_us % slide_us == 0
    k = window_us // slide_us

    def fan_out(b: pa.Table) -> pa.Table:
        # normalize to epoch-us regardless of input unit (ns from pandas)
        ts = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        base = (ts // slide_us) * slide_us
        starts = (base[None, :] -
                  (np.arange(k, dtype=np.int64) * slide_us)[:, None])
        items = b[item_col].to_numpy(zero_copy_only=False)
        win = starts.reshape(-1)
        item_rep = np.tile(items, k)
        # in-batch pair dedup before the shuffle
        uniq = pa.table({"window_start": pa.array(win),
                         item_col: pa.array(item_rep)}) \
            .group_by(["window_start", item_col]).aggregate([])
        return uniq

    pairs = ds.map_batches(fan_out, batch_format="pyarrow")

    def count_part(t: pa.Table) -> pa.Table:
        win = t["window_start"].to_numpy()
        items = t[item_col].to_numpy(zero_copy_only=False)
        if win.size == 0:
            return pa.table({"window_start": pa.array([], pa.timestamp("us")),
                             "n_distinct": pa.array([], pa.int64())})
        # exact identity (factorize, not a hash): a 64-bit hash collision
        # would silently undercount vs the SQL oracle's COUNT(DISTINCT)
        ih = items if items.dtype.kind in "iu" else \
            pd.factorize(items)[0].astype(np.int64)
        order = np.lexsort((ih, win))
        w, h = win[order], ih[order]
        first = np.concatenate(([True], (w[1:] != w[:-1]) | (h[1:] != h[:-1])))
        w_u = w[first]
        wstarts = np.flatnonzero(np.concatenate(([True],
                                                 w_u[1:] != w_u[:-1])))
        counts = np.diff(np.append(wstarts, w_u.size))
        return pa.table({
            "window_start": pa.array(w_u[wstarts], type=pa.timestamp("us")),
            "n_distinct": pa.array(counts.astype(np.int64))})

    parted = _add_part(pairs, "window_start", n_parts)
    return parted.groupby("_part").map_groups(
        lambda t: count_part(t.drop_columns(["_part"])),
        batch_format="pyarrow")
