"""Per-partition checkpoint manifests.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule): every finished partition appends one JSON line

    {"partition": str, "rows": int, "min_ts": str|None, "max_ts": str|None,
     "content_hash": str, "inputs": [str], "wall_s": float, "finished_at": str}

to ``<out_dir>/manifest.jsonl``; a rerun skips partitions already present
(kill-and-rerun produces identical outputs — tests/test_resume.py). Writes go
to a temp file + atomic rename so a crash mid-append never corrupts the
manifest. The reference has no checkpointing (SURVEY.md §4.1); the closest
analogue is HDF5 persistence of inputs (``/root/reference/src/hdf_util.py:11-14``).
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
                    if line:
                        row = json.loads(line)
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
        # atomic append: rewrite to temp + rename (manifests are small)
        existing = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                existing = [l for l in f.read().splitlines() if l.strip()]
        existing.append(json.dumps(row, sort_keys=True))
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(existing) + "\n")
        os.replace(tmp, self.path)


def table_content_hash(df) -> str:
    """Order-insensitive content hash of a small pandas frame (sorted by all
    columns, then sha256 of the csv bytes) — the lineage fingerprint recorded
    per partition."""
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]
