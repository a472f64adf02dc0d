"""Cluster job entrypoint — the ``ray job submit`` surface of the engine.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m tslib_ray --input 's3://bucket/events/*.parquet' \
                            --out /mnt/shared/rollups

``ray job submit`` starts this process on the head node with
``RAY_ADDRESS`` pointing at the cluster, so ``ray.init`` here attaches to
the running cluster (guarded — if a driver/test already initialised Ray,
that session is reused). Locally the same command line runs single-node
(``RAY_ADDRESS=local``).

The job is :func:`tslib_ray.pipelines.flagship.run_resumable`: shard-
granular partial aggregation with per-partition lineage manifests, tier
cascade 1m -> 1h -> 1d, gap-free Gorilla tile encode, partitioned parquet
output. Re-submitting after a failure skips every shard/tier the manifest
records as done, so the job is idempotent and resumable — kill it at any
point and the rerun produces identical outputs (tests/test_resume.py).

Prints ONE JSON line of run metrics (shards, skipped_shards, per-tier row
counts, wall_s) — the per-partition detail lives in ``<out>/manifest.jsonl``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _resolve_inputs(spec: str) -> list[str]:
    """File, directory (recursive *.parquet), or glob pattern -> file list."""
    if os.path.isdir(spec):
        files = sorted(glob.glob(os.path.join(spec, "**", "*.parquet"),
                                 recursive=True))
    elif any(ch in spec for ch in "*?["):
        files = sorted(glob.glob(spec))
    else:
        files = [spec]
    if not files:
        raise SystemExit(f"no parquet inputs match {spec!r}")
    return files


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(
        prog="python -m tslib_ray",
        description="Resumable rollup/downsample/retention job over event "
                    "or transcript parquet (submit via `ray job submit`).")
    p.add_argument("--input", required=True,
                   help="parquet file, directory, or glob of input events")
    p.add_argument("--out", required=True,
                   help="output root: partials/, tiers/, tiles/, "
                        "manifest.jsonl land here; reruns resume from it")
    p.add_argument("--key", default="user_id",
                   help="series key column (conv_id for transcript tables)")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--value-col", default="value")
    p.add_argument("--files-per-shard", type=int, default=8,
                   help="input files per resume shard (checkpoint granule)")
    p.add_argument("--encode-concurrency", type=int, default=2)
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; default
        # to local single-node otherwise
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from tslib_ray.pipelines.flagship import run_resumable

    files = _resolve_inputs(args.input)
    metrics = run_resumable(files, args.out, key=args.key, ts_col=args.ts_col,
                            value_col=args.value_col,
                            files_per_shard=args.files_per_shard,
                            encode_concurrency=args.encode_concurrency)
    metrics["inputs"] = len(files)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
