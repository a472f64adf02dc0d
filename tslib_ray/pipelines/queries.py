"""Driver-facing query pack: every implemented operator exposed as a
``sf_dir -> Dataset/DataFrame`` callable, each (where SQL-expressible) paired
with the DuckDB oracle SQL the driver compares against (same column names,
floats rounded to 6 decimals on BOTH sides so order-of-accumulation noise in
double sums cannot flip the value hash).

Registry shape: ``QUERIES[name] = (callable, oracle_sql | None)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..sources.transcripts import transcripts_from_events
from ..stages import rollup as R
from ..stages.ann import knn_brute, knn_ivf, cosine_dedup
from ..stages.dedup import dedup_exact, dedup_minhash, dedup_simhash
from ..stages.encode import decode_tiles_to_points, encode_tiles
from ..stages.gapfill import gap_fill
from ..stages.sessionize import session_stats
from ..stages.text import fingerprint, lang_id, quality_score, text_stats

_R6 = ["sum_value", "mean_value", "min_value", "max_value"]


def _round6(ds: "rd.Dataset", cols=None) -> "rd.Dataset":
    """Round float columns to 6 decimals (presentation for the value-hash
    compare; engine outputs stay unrounded)."""

    def fn(b: pa.Table) -> pa.Table:
        for c in cols or _R6:
            if c in b.column_names:
                i = b.column_names.index(c)
                b = b.set_column(i, c, pc.round(b[c], ndigits=6))
        return b

    return ds.map_batches(fn, batch_format="pyarrow")


def _events(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# rollup tiers (events): partial+final aggregation, cascade
# ---------------------------------------------------------------------------

def q_rollup_1m(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    return _round6(R.rollup(ds, ["user_id"], "ts", "value", "1m"))


def q_rollup_1h(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    return _round6(R.cascade(R.rollup(ds, ["user_id"], "ts", "value", "1m"),
                             ["user_id"], "1h"))


def q_rollup_1d(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    p1m = R.rollup(ds, ["user_id"], "ts", "value", "1m")
    return _round6(R.cascade(R.cascade(p1m, ["user_id"], "1h"),
                             ["user_id"], "1d"))


def _rollup_sql(unit: str) -> str:
    return f"""
        SELECT user_id, date_trunc('{unit}', ts) AS bucket_ts,
               ROUND(SUM(value), 6) AS sum_value,
               ROUND(MIN(value), 6) AS min_value,
               ROUND(MAX(value), 6) AS max_value,
               COUNT(value) AS n,
               ROUND(SUM(value) / COUNT(value), 6) AS mean_value
        FROM events GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# transcripts derivation + flagship latency rollup
# ---------------------------------------------------------------------------

def q_transcripts(sf_dir: str):
    ds = transcripts_from_events(sf_dir)
    return ds.select_columns(["conv_id", "turn_idx", "role", "text", "tool",
                              "ts"])


_TRANSCRIPTS_SQL = """
    SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS INTEGER)
               AS turn_idx,
           CASE event_type WHEN 'error' THEN 'tool'
                           WHEN 'purchase' THEN 'assistant'
                           ELSE 'user' END AS role,
           props AS text,
           CASE event_type WHEN 'error' THEN 'search' ELSE '' END AS tool,
           ts
    FROM events"""


def q_latency_rollup_1m(sf_dir: str):
    tr = transcripts_from_events(sf_dir)
    return _round6(R.rollup(tr, ["conv_id"], "ts", "latency_s", "1m"))


_LATENCY_SQL = """
    WITH t AS (
        SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id, ts,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0
                   AS latency_s
        FROM events)
    SELECT conv_id, date_trunc('minute', ts) AS bucket_ts,
           ROUND(SUM(latency_s), 6) AS sum_value,
           ROUND(MIN(latency_s), 6) AS min_value,
           ROUND(MAX(latency_s), 6) AS max_value,
           COUNT(latency_s) AS n,
           ROUND(SUM(latency_s) / COUNT(latency_s), 6) AS mean_value
    FROM t GROUP BY 1, 2"""


def q_rate_role_1h(sf_dir: str):
    tr = transcripts_from_events(sf_dir)
    return R.rate_by(tr, "role", "ts", "1h")


_RATE_ROLE_SQL = """
    SELECT CASE event_type WHEN 'error' THEN 'tool'
                           WHEN 'purchase' THEN 'assistant'
                           ELSE 'user' END AS role,
           date_trunc('hour', ts) AS bucket_ts,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2"""


def q_retention_last7d(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    p1m = R.rollup(ds, ["user_id"], "ts", "value", "1m")
    p1d = R.cascade(R.cascade(p1m, ["user_id"], "1h"), ["user_id"], "1d")
    trimmed = R.retention_trim(p1d, ["user_id"], keep_last=7)
    return _round6(trimmed.select_columns(["user_id", "bucket_ts", "n",
                                           "sum_value"]))


_RETENTION_SQL = """
    WITH d AS (
        SELECT user_id, date_trunc('day', ts) AS bucket_ts,
               COUNT(value) AS n, ROUND(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY bucket_ts DESC) AS rn FROM d)
    SELECT user_id, bucket_ts, n, sum_value FROM r WHERE rn <= 7"""


def q_sessionize(sf_dir: str):
    return session_stats(_events(sf_dir, ["user_id", "ts", "event_id"]))


_SESSIONIZE_SQL = """
    WITH o AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM o GROUP BY user_id"""


def q_normalize_value(sf_dir: str):
    """tsUtils.normalize as a distributed two-pass operator
    (``/root/reference/src/tsUtils.py:102-108``): global min/max aggregate,
    then a stateless vectorized map."""
    from ray.data.aggregate import Max, Min
    ds = _events(sf_dir, ["event_id", "value"])
    stats = ds.aggregate(Min("value"), Max("value"))
    vmin, vmax = stats["min(value)"], stats["max(value)"]
    mid, half = 0.5 * (vmin + vmax), 0.5 * (vmax - vmin)

    def fn(b: pa.Table) -> pa.Table:
        norm = pc.round(pc.divide(pc.subtract(b["value"], mid), half),
                        ndigits=6)
        return b.append_column("value_norm", norm).drop_columns(["value"])

    return ds.map_batches(fn, batch_format="pyarrow")


_NORMALIZE_SQL = """
    SELECT event_id,
           ROUND((value - 0.5 * (mn + mx)) / (0.5 * (mx - mn)), 6)
               AS value_norm
    FROM events, (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events)"""


# ---------------------------------------------------------------------------
# relational coverage (joins / grouped aggregates on the TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), b["l_discount"]))
        b = b.append_column("disc_price", disc)
        out = b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])
        return out.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                   "sum_base_price", "sum_disc_price",
                                   "count_order"])

    from ray.data.aggregate import Sum
    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"))
    return _round6(merged, cols=["sum_qty", "sum_base_price",
                                 "sum_disc_price"])


_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND(SUM(l_extendedprice), 6) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
               AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY 1, 2"""


def q_top_customers(sf_dir: str):
    """Broadcast hash join: customer (small side) is fetched once and joined
    inside the final (tiny) aggregate result — no shuffle join."""
    from ray.data.aggregate import Sum
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    rev = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue")).to_pandas()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    out = rev.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["revenue"] = out["revenue"].round(6)
    out = out.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).head(10)
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


_TOP_CUST_SQL = """
    SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 6) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10"""


# ---------------------------------------------------------------------------
# documents: dedup / text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    kept = dedup_exact(_docs(sf_dir, ["doc_id", "text"]))
    return kept.select_columns(["doc_id"])


_DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def q_text_stats(sf_dir: str):
    out = text_stats(_docs(sf_dir, ["doc_id", "text"]))
    return out.select_columns(["doc_id", "n_chars_c", "n_tokens", "n_stop"])


_TEXT_STATS_SQL = """
    SELECT doc_id, LENGTH(text) AS n_chars_c,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to','in','is','for','on','with')))
               AS n_stop
    FROM documents"""


def q_ann_top10(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q0 = pd.read_parquet(f"{sf_dir}/embeddings.parquet").query("vec_id == 0")
    query = np.asarray(q0["embedding"].iloc[0], dtype=np.float64)
    out = knn_brute(emb, query[None, :], k=10)
    return out[["vec_id", "sim"]].reset_index(drop=True)


_ANN_SQL = """
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = 0)), 6) AS sim
    FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10"""


# ---------------------------------------------------------------------------
# rows-only checked (non-SQL-expressible) operators
# ---------------------------------------------------------------------------

def q_gap_fill_linear(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    pts = R.rollup(ds, ["user_id"], "ts", "value", "1h")
    return gap_fill(pts, ["user_id"], "1h", value_col="mean_value",
                    method="linear")


def q_gorilla_tiles_1h(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    pts = R.rollup(ds, ["user_id"], "ts", "value", "1h")
    clustered = pts.groupby(["user_id"]).map_groups(
        lambda g: g.sort_values("bucket_ts", kind="mergesort"),
        batch_format="pandas")
    tiles = encode_tiles(clustered, ["user_id"], "1h", concurrency=2)
    return tiles.select_columns(["user_id", "tier", "tile_start_ts",
                                 "n_points"])


def q_gorilla_roundtrip_1h(sf_dir: str):
    """Encode then decode; output must equal the input points (verified
    row-for-row by pytest; here surfaced as a query for the rows check)."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    pts = R.rollup(ds, ["user_id"], "ts", "value", "1h")
    clustered = pts.groupby(["user_id"]).map_groups(
        lambda g: g.sort_values("bucket_ts", kind="mergesort"),
        batch_format="pandas")
    tiles = encode_tiles(clustered, ["user_id"], "1h", concurrency=2)
    return _round6(decode_tiles_to_points(tiles, ["user_id"]),
                   cols=["mean_value"])


_ROUNDTRIP_SQL = """
    SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
           ROUND(SUM(value) / COUNT(value), 6) AS mean_value
    FROM events GROUP BY 1, 2"""


def q_minhash_dedup(sf_dir: str):
    return dedup_minhash(_docs(sf_dir, ["doc_id", "text"]),
                         threshold=0.8).select_columns(["doc_id"])


def q_simhash_candidates(sf_dir: str):
    return dedup_simhash(_docs(sf_dir, ["doc_id", "text"]))


def q_embedding_dedup(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # synthetic embeddings are near-orthogonal; 0.25 surfaces the near-dup
    # tail (the production threshold would be ~0.95)
    return cosine_dedup(emb, threshold=0.25)


def q_knn_ivf(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q0 = pd.read_parquet(f"{sf_dir}/embeddings.parquet").query("vec_id == 0")
    query = np.asarray(q0["embedding"].iloc[0], dtype=np.float64)
    return knn_ivf(emb, query[None, :], k=10)[["vec_id", "sim", "rank"]]


def q_quality_score(sf_dir: str):
    out = quality_score(_docs(sf_dir, ["doc_id", "text"]))
    return out.select_columns(["doc_id", "quality_score"])


def q_lang_id(sf_dir: str):
    out = lang_id(_docs(sf_dir, ["doc_id", "text", "lang"]))
    return out.select_columns(["doc_id", "lang", "lang_pred"])


def q_fingerprint(sf_dir: str):
    out = fingerprint(_docs(sf_dir, ["doc_id", "text"]))
    return out.select_columns(["doc_id", "fingerprint"])


# ---------------------------------------------------------------------------
# blocked-matrix ops (hdf_util analogue) — SQL-checkable via derived matrices
# ---------------------------------------------------------------------------

def _lineitem_matrix(sf_dir: str, rows: int = 20, cols: int = 15):
    """Deterministic small matrix derived from lineitem:
    A[i,j] = sum(l_quantity) over (l_orderkey%rows, l_partkey%cols)."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])

    def project(b: pa.Table) -> pa.Table:
        import numpy as np
        i = b["l_orderkey"].to_numpy() % rows
        j = b["l_partkey"].to_numpy() % cols
        return pa.table({"i": pa.array(i), "j": pa.array(j),
                         "val": b["l_quantity"]})

    out = ds.map_batches(project, batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(Sum("val", alias_name="val"))
    return out


def q_matrix_matmul(sf_dir: str):
    """A @ A^T of the lineitem-derived matrix (the reference's blocked dot,
    hdf_util.py:143-245, as broadcast partial products + one shuffle)."""
    from tslib_ray.stages import matrix as MX
    A = _lineitem_matrix(sf_dir)
    At = MX.transpose(A).to_pandas()
    out = MX.matmul_broadcast(A, At)
    return _round6(out, cols=["val"])


_MATMUL_SQL = """
    WITH A AS (SELECT l_orderkey % 20 AS i, l_partkey % 15 AS j,
                      SUM(l_quantity) AS val
               FROM lineitem GROUP BY 1, 2)
    SELECT a.i AS i, b.i AS j, ROUND(SUM(a.val * b.val), 6) AS val
    FROM A a JOIN A b ON a.j = b.j GROUP BY 1, 2"""


def q_matrix_add(sf_dir: str):
    from tslib_ray.stages import matrix as MX
    A = _lineitem_matrix(sf_dir)
    B = MX.transpose(_lineitem_matrix(sf_dir, rows=15, cols=20))
    return _round6(MX.add(A, B), cols=["val"])


_MATRIX_ADD_SQL = """
    WITH A AS (SELECT l_orderkey % 20 AS i, l_partkey % 15 AS j,
                      SUM(l_quantity) AS val
               FROM lineitem GROUP BY 1, 2),
         B AS (SELECT l_orderkey % 15 AS i, l_partkey % 20 AS j,
                      SUM(l_quantity) AS val
               FROM lineitem GROUP BY 1, 2)
    SELECT COALESCE(a.i, b.j) AS i, COALESCE(a.j, b.i) AS j,
           ROUND(COALESCE(a.val, 0) + COALESCE(b.val, 0), 6) AS val
    FROM A a FULL OUTER JOIN B b ON a.i = b.j AND a.j = b.i"""


# ---------------------------------------------------------------------------
# synth-control / incremental / multimodal (rows-only)
# ---------------------------------------------------------------------------

def q_rsc_counterfactual(sf_dir: str):
    from tslib_ray.sources.panel import synth_panel
    from tslib_ray.stages.panel import rsc_counterfactuals
    panel, _ = synth_panel(n_experiments=4, seed=42)
    return rsc_counterfactuals(rd.from_pandas(panel), "treated", 4,
                               train_end=30)


def q_mrsc_counterfactual(sf_dir: str):
    from tslib_ray.sources.panel import synth_panel
    from tslib_ray.stages.panel import rsc_counterfactuals
    panel, _ = synth_panel(n_metrics=2, n_experiments=2, seed=42)
    return rsc_counterfactuals(rd.from_pandas(panel), "treated", 4,
                               train_end=30)


def q_incremental_denoise(sf_dir: str):
    """Per-user incremental TSmodel denoise over the event value stream."""
    from tslib_ray.stages.incremental import denoise_per_key
    ds = _events(sf_dir, ["user_id", "event_id", "value"])
    return denoise_per_key(ds, "user_id", "event_id", "value",
                           k=2, L=5, T0=30, rect_factor=3)


def q_media_features(sf_dir: str):
    from tslib_ray.stages.multimodal import media_features, synth_media
    return media_features(synth_media(256, payload_bytes=2048, seed=42),
                          concurrency=2)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict = {
    "rollup_1m": (q_rollup_1m, _rollup_sql("minute")),
    "rollup_1h": (q_rollup_1h, _rollup_sql("hour")),
    "rollup_1d": (q_rollup_1d, _rollup_sql("day")),
    "transcripts_derive": (q_transcripts, _TRANSCRIPTS_SQL),
    "latency_rollup_1m": (q_latency_rollup_1m, _LATENCY_SQL),
    "rate_role_1h": (q_rate_role_1h, _RATE_ROLE_SQL),
    "retention_last7d": (q_retention_last7d, _RETENTION_SQL),
    "sessionize": (q_sessionize, _SESSIONIZE_SQL),
    "normalize_value": (q_normalize_value, _NORMALIZE_SQL),
    "pricing_summary": (q_pricing_summary, _PRICING_SQL),
    "top_customers": (q_top_customers, _TOP_CUST_SQL),
    "dedup_exact": (q_dedup_exact, _DEDUP_EXACT_SQL),
    "text_stats": (q_text_stats, _TEXT_STATS_SQL),
    "ann_top10": (q_ann_top10, _ANN_SQL),
    "gorilla_roundtrip_1h": (q_gorilla_roundtrip_1h, _ROUNDTRIP_SQL),
    "matrix_matmul": (q_matrix_matmul, _MATMUL_SQL),
    "matrix_add": (q_matrix_add, _MATRIX_ADD_SQL),
    # rows-only (non-SQL-expressible) checks
    "gap_fill_linear": (q_gap_fill_linear, None),
    "gorilla_tiles_1h": (q_gorilla_tiles_1h, None),
    "minhash_dedup": (q_minhash_dedup, None),
    "simhash_candidates": (q_simhash_candidates, None),
    "embedding_dedup": (q_embedding_dedup, None),
    "knn_ivf": (q_knn_ivf, None),
    "quality_score": (q_quality_score, None),
    "lang_id": (q_lang_id, None),
    "fingerprint": (q_fingerprint, None),
    "rsc_counterfactual": (q_rsc_counterfactual, None),
    "mrsc_counterfactual": (q_mrsc_counterfactual, None),
    "incremental_denoise": (q_incremental_denoise, None),
    "media_features": (q_media_features, None),
}
