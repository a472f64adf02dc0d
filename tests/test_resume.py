"""Kill-and-rerun resume semantics with LINEAGE HASH equality (VERDICT r01
item 9): the manifest's per-partition content_hash/min_ts/max_ts are real,
and a rerun after losing a tier reproduces bit-identical content (same
fingerprint), not merely the same row counts."""

import json
import os
import shutil

import pandas as pd

from tslib_ray.pipelines.flagship import run_resumable
from tslib_ray.state.manifest import Manifest


def _manifest_rows(out: str) -> dict:
    rows = {}
    with open(os.path.join(out, "manifest.jsonl")) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                rows[r["partition"]] = r
    return rows


def test_lineage_fields_recorded(tmp_path, sf_small):
    out = str(tmp_path / "run")
    run_resumable([f"{sf_small}/events.parquet"], out, key="user_id")
    rows = _manifest_rows(out)
    for part, r in rows.items():
        assert r["rows"] > 0, part
        assert r["content_hash"] not in ("", None), part
        if part.startswith(("tiers/", "partials/")):
            assert r["min_ts"] is not None and r["max_ts"] is not None, part
            assert r["min_ts"] <= r["max_ts"], part


def test_rerun_after_lost_tier_reproduces_hash(tmp_path, sf_small):
    out = str(tmp_path / "run")
    run_resumable([f"{sf_small}/events.parquet"], out, key="user_id")
    first = _manifest_rows(out)

    # simulate a crash that lost the 1d tier + its tiles mid-write: remove
    # outputs and their manifest entries, keep everything else
    lost = [p for p in first if p in ("tiers/1d", "tiles/1d")]
    assert lost == ["tiers/1d", "tiles/1d"]
    for p in lost:
        shutil.rmtree(os.path.join(out, p), ignore_errors=True)
    man_path = os.path.join(out, "manifest.jsonl")
    with open(man_path) as f:
        keep = [l for l in f.read().splitlines()
                if l.strip() and json.loads(l)["partition"] not in lost]
    with open(man_path, "w") as f:
        f.write("\n".join(keep) + "\n")

    m2 = run_resumable([f"{sf_small}/events.parquet"], out, key="user_id")
    assert m2["skipped_shards"] == m2["shards"]  # partials untouched
    second = _manifest_rows(out)
    for p in lost:
        assert second[p]["content_hash"] == first[p]["content_hash"], p
        assert second[p]["rows"] == first[p]["rows"], p
    # unaffected partitions were not recomputed (same finished_at entries)
    for p in first:
        if p not in lost:
            assert second[p] == first[p], p


def test_fresh_run_is_deterministic(tmp_path, sf_small):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    run_resumable([f"{sf_small}/events.parquet"], a, key="user_id")
    run_resumable([f"{sf_small}/events.parquet"], b, key="user_id")
    ra, rb = _manifest_rows(a), _manifest_rows(b)
    assert set(ra) == set(rb)
    for p in ra:
        assert ra[p]["content_hash"] == rb[p]["content_hash"], p
