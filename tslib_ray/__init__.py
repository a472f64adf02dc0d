"""tslib_ray — a Ray-Data-native time-series rollup + downsample + retention
engine with the query/data-processing capabilities of ``jehangiramjad/tslib``.

Built from scratch on ``ray.data.Dataset`` streaming execution:

- ``kernels/``   pure-numpy per-group math (page matrix, truncated SVD, ALSWR,
                 robust synthetic control, Gorilla codec, synthetic generators)
                 — semantics match the reference (cited per function), bugs
                 excluded (SURVEY.md §2.11).
- ``sources/``   parquet readers + deterministic transcript synthesis.
- ``stages/``    Dataset -> Dataset batch transforms (bucketed rollups with
                 partial/final aggregation, gap-fill, imputation, Gorilla
                 encode, dedup, text analysis, ANN).
- ``pipelines/`` end-to-end flagship pipelines (rollup -> tier cascade ->
                 gap-fill -> encode -> partitioned parquet + manifest).
- ``state/``     checkpoint manifests for resumable runs.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
