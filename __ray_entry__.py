"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in tslib_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``       — flagship rollup pipeline on /root/testdata/sf0.001.
- ``queries()``     — every implemented operator as ``sf_dir -> result``.
- ``oracle_sql()``  — DuckDB-equivalent SQL per SQL-expressible query
                      (column names match; floats rounded to 6dp both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from tslib_ray.pipelines.queries import QUERIES
from tslib_ray.pipelines.flagship import flagship_from_events


def entry() -> Any:
    """Flagship: events -> transcripts (turn_idx, latency) -> per-conversation
    1m latency rollup tier points."""
    return flagship_from_events("/root/testdata/sf0.001", tier="1m")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
