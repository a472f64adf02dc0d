"""Approximate/exact nearest-neighbor search over an embedding column
(``list<float>``).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast once
  via ``ray.put`` and read in every task (never re-shipped per batch); each
  batch contributes its local top-k (numpy matmul), and the driver merges the
  tiny per-batch candidate sets. Scales linearly in corpus size with no
  shuffle.
- :func:`knn_ivf` — IVF-style scale path: k-means-lite centroids (sampled,
  seeded), assign each vector to its nearest centroid in a ``map_batches``
  pass, then search only the ``n_probe`` closest partitions.
- :func:`cosine_dedup` — embedding near-duplicate pairs above a cosine
  threshold, via centroid-bucketed blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy when possible)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norm, 1e-30)


def knn_brute(embeddings: "rd.Dataset", queries: np.ndarray, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    ``(query_idx, vec_id, sim, rank)`` sorted by (query_idx, rank)."""
    q = _normalize_rows(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize_rows(_to_matrix(batch[vec_col]))
        sims = qm @ m.T  # (nq, nb)
        ids = batch[id_col].to_numpy()
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = sims.shape[0]
        qi = np.repeat(np.arange(nq), kk)
        vi = top.reshape(-1)
        return pa.table({
            "query_idx": pa.array(qi, type=pa.int32()),
            id_col: pa.array(ids[vi]),
            "sim": pa.array(np.floor(sims[qi, vi] * 1e6 + 0.5) / 1e6),
        })

    cand = embeddings.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_idx", "sim", id_col],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount().astype(np.int32)
    return out


def train_centroids(embeddings: "rd.Dataset", n_centroids: int = 16,
                    sample_frac: float = 0.1, iters: int = 5,
                    vec_col: str = "embedding", seed: int = 5) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (the sample is small; the
    assignment pass is distributed)."""
    sample = embeddings.random_sample(min(1.0, sample_frac), seed=seed)
    tables = [ray.get(r) for r in sample.to_arrow_refs()]
    m = _normalize_rows(_to_matrix(pa.concat_tables(tables)[vec_col]))
    if m.shape[0] < n_centroids:
        m = np.vstack([m] * (n_centroids // max(1, m.shape[0]) + 1))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(m.shape[0], n_centroids, replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize_rows(cent)
    return cent


def knn_ivf(embeddings: "rd.Dataset", queries: np.ndarray, k: int = 10,
            n_centroids: int = 16, n_probe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 5) -> pd.DataFrame:
    """IVF top-k: assign vectors to centroid partitions, search only the
    query's ``n_probe`` nearest partitions."""
    cent = train_centroids(embeddings, n_centroids, vec_col=vec_col, seed=seed)
    cent_ref = ray.put(cent)
    q = _normalize_rows(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_sets = [set(map(int, row)) for row in probe]
    q_ref = ray.put(q)

    def assign_and_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qm = ray.get(q_ref)
        m = _normalize_rows(_to_matrix(batch[vec_col]))
        part = (m @ c.T).argmax(axis=1)
        ids = batch[id_col].to_numpy()
        tables = []
        for qi, pset in enumerate(probe_sets):
            sel = np.isin(part, list(pset))
            if not sel.any():
                continue
            sims = (qm[qi] @ m[sel].T)
            kk = min(k, sims.size)
            top = np.argpartition(-sims, kk - 1)[:kk]
            tables.append(pa.table({
                "query_idx": pa.array(np.full(kk, qi, dtype=np.int32)),
                id_col: pa.array(ids[sel][top]),
                "sim": pa.array(np.floor(sims[top] * 1e6 + 0.5) / 1e6),
            }))
        if not tables:
            return pa.table({"query_idx": pa.array([], type=pa.int32()),
                             id_col: pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.concat_tables(tables)

    cand = embeddings.map_batches(assign_and_topk,
                                  batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_idx", "sim", id_col],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount().astype(np.int32)
    return out


def cosine_dedup(embeddings: "rd.Dataset", threshold: float = 0.95,
                 n_centroids: int = 16, id_col: str = "vec_id",
                 vec_col: str = "embedding", seed: int = 5) -> "rd.Dataset":
    """Embedding near-dup pairs ``(vec_id, dup_root)`` with cosine >=
    threshold, blocked by centroid partition (pairs across partitions are
    missed — documented recall/cost tradeoff of the blocking approach)."""
    cent_ref = ray.put(train_centroids(embeddings, n_centroids,
                                       vec_col=vec_col, seed=seed))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize_rows(_to_matrix(batch[vec_col]))
        part = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize_rows(np.vstack(g[vec_col].to_numpy()[order]))
        sims = m @ m.T
        rows_i, rows_j = np.where(np.triu(sims >= threshold, k=1))
        if len(rows_i) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "dup_root": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({id_col: ids[rows_j], "dup_root": ids[rows_i]})
        return df.groupby(id_col, as_index=False)["dup_root"].min()

    return embeddings.map_batches(assign, batch_format="pyarrow") \
        .groupby("part").map_groups(pairs, batch_format="pandas")
