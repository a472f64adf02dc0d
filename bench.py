#!/usr/bin/env python
"""Benchmark harness (driver contract).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)`` and
prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "rows_in": R, "turns_per_sec": T}

``--scaling``: runs the headline pipeline twice in fresh subprocesses
(num_cpus=8 then 32) on the same input and prints throughputs + scaling
efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_benchmarks() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd
    from tslib_ray.pipelines.queries import QUERIES

    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(f"{SF_DIR}/events.parquet").count()
    rows_in = rd.read_parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}

    def timed(name: str):
        fn = QUERIES[name][0]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()  # consume the stream
        timings[name] = round(time.perf_counter() - t0, 3)
        return res

    # headline: flagship latency rollup (derive transcripts + 1m tier)
    headline = "latency_rollup_1m"
    for name in (headline, "rollup_1m", "rollup_1h", "rollup_1d",
                 "sessionize", "gap_fill_linear", "gorilla_tiles_1h",
                 "dedup_exact", "text_stats", "ann_top10", "minhash_dedup"):
        timed(name)

    value = timings[headline]
    out = {
        "metric": "flagship latency rollup wall time (events->transcripts->1m tier)",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows_in": int(rows_in),
        "turns_per_sec": round(rows_in / value, 1) if value else None,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        res = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        return json.loads(res.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = sub(lo), sub(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (N=8 -> 4N=32 cpus, same input)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
