"""Metadata-clean parquet reader.

The driver's testdata parquet files carry a ``pandas`` schema-metadata blob;
in pyarrow 16.1 ``pa.Schema.__hash__`` RAISES (``unhashable type: 'dict'``)
on schemas with that metadata, which silently defeats Ray Data's block-schema
deduplication in every read/reduce task downstream (the repeated ``Failed to
hash the schemas (for deduplication)`` warnings in BENCH_r04's tail —
VERDICT r04 item 6). At scale that means Ray re-ships and re-unifies one
schema object per block instead of deduplicating, an allocation tax on every
exchange.

Fix at the source: read the file footer's schema once (driver-side, free —
it is pure metadata), strip the pandas blob, and hand the clean schema to
``ray.data.read_parquet`` so every block the read emits is hashable. Column
pruning still happens at the parquet layer (``columns=`` is forwarded).
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _first_file(path: str) -> str | None:
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                recursive=True))
        return hits[0] if hits else None
    return path


def read_parquet_clean(path, *, columns=None, **kwargs) -> "rd.Dataset":
    """``ray.data.read_parquet`` with the footer schema's pandas metadata
    stripped, so downstream block schemas are hashable (dedupable).

    Accepts a file path, a directory, or a list of paths; forwards
    ``columns=``/``filter=``/etc. untouched. Falls back to a plain read if
    the footer cannot be inspected (e.g. empty directory at plan time).
    """
    if "schema" not in kwargs:
        probe = path[0] if isinstance(path, (list, tuple)) else path
        f = _first_file(probe)
        if f is not None and os.path.exists(f):
            try:
                full = pq.read_schema(f).remove_metadata()
            except Exception:
                full = None  # unreadable footer: plain read below
            if full is not None and columns is not None:
                # Ray binds a pushed `filter=` against the EXPLICIT schema
                # (which must exactly match `columns`), so a filter on an
                # unselected column fails to bind. Widen the read to the
                # filter's fields (the parquet scan decodes them for row
                # filtering anyway) and select back down — the select fuses
                # with the read, so nothing extra leaves the scan stage.
                extra: list[str] = []
                if "filter" in kwargs and kwargs["filter"] is not None:
                    tokens = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*",
                                            str(kwargs["filter"])))
                    extra = [n for n in full.names
                             if n in tokens and n not in columns]
                kwargs["schema"] = pa.schema(
                    [full.field(c) for c in list(columns) + extra])
                ds = rd.read_parquet(path, columns=list(columns) + extra,
                                     **kwargs)
                return ds.select_columns(list(columns)) if extra else ds
            if full is not None:
                kwargs["schema"] = full
    return rd.read_parquet(path, columns=columns, **kwargs)
