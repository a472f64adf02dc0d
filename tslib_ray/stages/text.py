"""Text analysis stages over document tables (large-scale training-data ops).

All stages are vectorized ``map_batches`` transforms; the stateful ones
(compiled regexes, stopword sets) are actor-pool callable classes so setup
runs once per actor. No reference analogue (tslib is numeric-only); these are
engine-native operators, SQL-mirrored in ``__ray_entry__.oracle_sql`` where
expressible.
"""

from __future__ import annotations

import re

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


class QualityScorer:
    """Actor-pool stage: heuristic quality scoring (length, punctuation,
    stopword ratio). Regexes compiled once per actor."""

    def __init__(self):
        self.punct = re.compile(r"[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_chars = text.str.len().to_numpy(dtype=np.float64)
        tokens = text.str.split(" ")
        n_tokens = tokens.str.len().to_numpy(dtype=np.float64)
        stop_ratio = tokens.map(
            lambda ws: sum(w in STOPWORDS for w in ws) / max(1, len(ws))
        ).to_numpy(dtype=np.float64)
        punct_ratio = text.str.count(self.punct).to_numpy(dtype=np.float64) / np.maximum(n_chars, 1)
        mean_tok_len = n_chars / np.maximum(n_tokens, 1)
        score = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct_ratio * 10.0, 0, 1)) * 0.2
            + np.clip(mean_tok_len / 8.0, 0, 1) * 0.1
        )
        batch["quality_score"] = np.round(score, 6)
        return batch


def quality_score(docs: "rd.Dataset", concurrency: int = 2) -> "rd.Dataset":
    return docs.map_batches(QualityScorer, batch_format="pandas",
                            concurrency=concurrency)


class LangId:
    """Actor-pool stage: marker-vocabulary language heuristic."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z']+")
        self.markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def classify(text: str) -> str:
            ws = self.word.findall(text.lower())
            if not ws:
                return "unk"
            best, best_hits = "unk", 0
            for lang, vocab in self.markers.items():
                hits = sum(w in vocab for w in ws)
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        batch["lang_pred"] = batch["text"].map(classify)
        return batch


def lang_id(docs: "rd.Dataset", concurrency: int = 2) -> "rd.Dataset":
    return docs.map_batches(LangId, batch_format="pandas",
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
