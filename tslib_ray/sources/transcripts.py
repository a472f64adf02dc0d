"""Transcript table sources.

Canonical engine input schema (BASELINE.json ``input_hint`` / FIXTURES.md F1):

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Two sources:

- :func:`synth_transcripts` — deterministic, seeded, Zipf-skewed synthetic
  transcripts generated *distributedly* (one seed row per conversation ->
  ``map_batches`` fan-out; no driver-side loops). Every field is a pure hash
  function of ``(seed, conv, turn)``, so the table is byte-identical at any
  parallelism / block layout — the determinism invariant SURVEY.md §5.2.4
  requires.
- :func:`transcripts_from_events` — derives a transcript-shaped table from the
  driver's ``events`` table (TESTDATA.md) so the flagship pipeline is
  DuckDB-oracle-checkable: ``conv_id = 'c'||user_id``, ``turn_idx`` = rank of
  ``(ts, event_id)`` within the conversation, role/tool mapped from
  ``event_type`` by a fixed SQL-expressible rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

ROLE_CYCLE = ("user", "assistant", "tool")
TOOL_VOCAB = ("search", "code", "browser")
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

# events.event_type -> (role, tool); fixed and mirrored in oracle SQL
EVENT_ROLE_MAP = {
    "click": ("user", ""),
    "view": ("user", ""),
    "signup": ("user", ""),
    "purchase": ("assistant", ""),
    "error": ("tool", "search"),
}

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 hash (public-domain constants)."""
    x = x.astype(np.uint64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _hash_uniform(*parts: np.ndarray) -> np.ndarray:
    """Uniform (0,1) doubles from hashed integer parts."""
    h = _U64(0)
    for p in parts:
        h = _splitmix64(np.asarray(p, dtype=np.int64).astype(np.uint64) ^ h)
    return (h >> _U64(11)).astype(np.float64) * (2.0 ** -53) + 2.0 ** -54


def conv_sizes(conv: np.ndarray, mean_turns: int, zipf_a: float,
               seed: int) -> np.ndarray:
    """Pareto/Zipf-skewed conversation length, a pure function of the conv id
    (hot keys exist by construction — the skew-handling test case)."""
    u = _hash_uniform(conv, np.full_like(conv, seed))
    sizes = 2 + (0.5 * mean_turns * np.power(u, -1.0 / zipf_a)).astype(np.int64)
    return np.minimum(sizes, 50_000)


def _gen_conv_block(conv: np.ndarray, seed: int, mean_turns: int,
                    zipf_a: float, cadence_s: float, jitter_s: float) -> pa.Table:
    """Generate all turn rows for a block of conversation ids (vectorized;
    no per-row or per-conv Python loops)."""
    conv = np.asarray(conv, dtype=np.int64)
    sizes = conv_sizes(conv, mean_turns, zipf_a, seed)
    n_rows = int(sizes.sum())
    conv_rep = np.repeat(conv, sizes)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    turn_idx = (np.arange(n_rows) - np.repeat(starts, sizes)).astype(np.int32)

    start_offset_us = (
        _hash_uniform(conv, np.full_like(conv, seed + 1)) * 30 * 86400 * 1e6
    ).astype(np.int64)
    jitter = (_hash_uniform(conv_rep * 3 + 1, turn_idx) - 0.5) * 2 * jitter_s
    gap_us = ((cadence_s + jitter) * 1e6).astype(np.int64)
    # segmented cumsum of per-turn gaps (strictly increasing within conv)
    cum = np.cumsum(gap_us)
    within = cum - np.repeat(cum[starts] - gap_us[starts], sizes)
    ts_us = BASE_TS_US + np.repeat(start_offset_us, sizes) + within

    role_idx = turn_idx % 3
    roles = np.array(ROLE_CYCLE)[role_idx]
    tools = np.where(role_idx == 2,
                     np.array(TOOL_VOCAB)[(conv_rep + turn_idx) % len(TOOL_VOCAB)],
                     "")
    conv_str = np.char.add("c", conv_rep.astype(str))
    text_hash = _splitmix64((conv_rep * 1_000_003).astype(np.uint64)
                            ^ turn_idx.astype(np.uint64)) % _U64(2**31)
    texts = np.char.add(
        np.char.add(np.char.add(conv_str, ":"), turn_idx.astype(str)),
        np.char.add(":", text_hash.astype(str)))
    value = np.round(_hash_uniform(conv_rep * 7 + 5, turn_idx) * 500.0, 2)

    return pa.table({
        "conv_id": pa.array(conv_str),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(roles),
        "text": pa.array(texts),
        "tool": pa.array(tools),
        "ts": pa.array(ts_us, type=pa.timestamp("us")),
        "value": pa.array(value, type=pa.float64()),
    })


def synth_transcripts(n_convs: int, mean_turns: int = 40, zipf_a: float = 1.8,
                      cadence_s: float = 45.0, jitter_s: float = 20.0,
                      seed: int = 42, parallelism: int = -1) -> "rd.Dataset":
    """Deterministic synthetic transcripts as a streaming Dataset."""

    def gen(batch: pa.Table) -> pa.Table:
        return _gen_conv_block(batch["id"].to_numpy(), seed, mean_turns,
                               zipf_a, cadence_s, jitter_s)

    seeds = rd.range(n_convs,
                     override_num_blocks=parallelism if parallelism > 0 else None)
    return seeds.map_batches(gen, batch_format="pyarrow", batch_size=2048)


def synth_transcripts_table(n_convs: int, mean_turns: int = 40,
                            zipf_a: float = 1.8, cadence_s: float = 45.0,
                            jitter_s: float = 20.0, seed: int = 42) -> pa.Table:
    """Driver-local (no Ray) variant for small fixtures; identical content to
    :func:`synth_transcripts` on the same params."""
    tables = [
        _gen_conv_block(np.arange(lo, min(lo + 2048, n_convs)), seed,
                        mean_turns, zipf_a, cadence_s, jitter_s)
        for lo in range(0, n_convs, 2048)
    ]
    return pa.concat_tables(tables)


def _derive_transcript_part(g: pd.DataFrame) -> pd.DataFrame:
    """Partition-level derivation, vectorized across ALL conversations in the
    partition: stable sort by (user, ts, event_id), dense per-conv turn_idx
    (cumcount), role/tool mapping, inter-turn latency masked at conversation
    boundaries. Emits only the columns present in the input (text/role/tool
    optional so callers can prune wide columns before the shuffle —
    SURVEY.md §7.3.4)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n = len(g)
    uid = g["user_id"].to_numpy()
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = uid[1:] != uid[:-1]
    # dense turn index per conversation: global arange minus each conv's start
    pos = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(first, pos, 0))
    out = {"conv_id": "c" + g["user_id"].astype(str),
           "turn_idx": (pos - start).astype(np.int32)}
    if "event_type" in g:
        # unseen event types fall through to 'user'/'' — mirrors the oracle
        # SQL's CASE ... ELSE branch (ADVICE r01)
        out["role"] = g["event_type"].map(
            {k: v[0] for k, v in EVENT_ROLE_MAP.items()}
        ).fillna("user").to_numpy()
    if "props" in g:
        out["text"] = g["props"].to_numpy()
    if "event_type" in g:
        out["tool"] = g["event_type"].map(
            {k: v[1] for k, v in EVENT_ROLE_MAP.items()}
        ).fillna("").to_numpy()
    out["ts"] = g["ts"].to_numpy()
    if "value" in g:
        out["value"] = g["value"].to_numpy()
    lat = g["ts"].diff().dt.total_seconds().to_numpy()
    lat[first] = np.nan
    out["latency_s"] = lat
    return pd.DataFrame(out)


_FULL_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def transcripts_map_only(sf_dir: str,
                         value_cols: tuple = ()) -> "rd.Dataset":
    """Map-only transcript projection: ``conv_id`` (``'c'||user_id``),
    ``role`` and ``tool`` (fixed EVENT_ROLE_MAP of ``event_type``) are PURE
    row functions of the events columns, so any pipeline that does not need
    the ordering-derived fields (``turn_idx``, ``latency_s``) can skip the
    conversation hash exchange entirely — at 100 TB that removes the single
    all-to-all from e.g. a per-role rate rollup, leaving only the tiny
    partial-aggregate exchange. ``value_cols`` names extra events columns to
    pass through untouched."""
    from .reader import read_parquet_clean

    cols = ["user_id", "ts", "event_type", *value_cols]
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)
    role_map = {k: v[0] for k, v in EVENT_ROLE_MAP.items()}
    tool_map = {k: v[1] for k, v in EVENT_ROLE_MAP.items()}

    def fn(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        out = {"conv_id": pa.array(
            ("c" + b["user_id"].to_pandas().astype(str)).to_numpy(object)),
            "role": pa.array(et.map(role_map).fillna("user")
                             .to_numpy(object)),
            "tool": pa.array(et.map(tool_map).fillna("").to_numpy(object)),
            "ts": b["ts"]}
        for c in value_cols:
            out[c] = b[c]
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def transcripts_from_events(sf_dir: str, columns=_FULL_COLS,
                            n_parts: int = 64) -> "rd.Dataset":
    """events.parquet -> transcript-shaped Dataset with derived ``turn_idx``
    and ``latency_s``. One hash shuffle on a stable key-hash bucket (whole
    conversations co-located; UDF vectorized across every conversation in a
    partition). Pass a pruned ``columns`` (always including
    event_id/ts/user_id) to keep wide payload columns out of the shuffle
    when downstream only needs the derived numerics."""
    from ..stages.rollup import _add_part
    from .reader import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=list(columns))
    parted = _add_part(ds, "user_id", n_parts)
    return parted.groupby("_part").map_groups(
        lambda g: _derive_transcript_part(g.drop(columns=["_part"])),
        batch_format="pandas")
