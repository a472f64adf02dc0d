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
    """SQL per query. Plain strings are DuckDB relational mirrors; callables
    are lazy builders that run a sequential no-Ray reference implementation
    over the driver's sf0.01 fixtures (or the seeded synthetic fixture) and
    embed the result as a VALUES literal — see tslib_ray/pipelines/oracles.py
    for the protocol."""
    global _ORACLE_CACHE
    if _ORACLE_CACHE is None:
        _ORACLE_CACHE = {name: (sql() if callable(sql) else sql)
                         for name, (_fn, sql) in QUERIES.items()
                         if sql is not None}
    return _ORACLE_CACHE


_ORACLE_CACHE: dict[str, str] | None = None
