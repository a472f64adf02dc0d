"""Pure-Python byte-pair-encoding over a committed merge-table fixture.

Upgrades ``stages/text.py::TokenCounter`` (regex pretoken counting) to REAL
BPE merges — the unit actual LLM data budgets are priced in. Everything here
is public knowledge: the training loop is Sennrich et al. 2016 ("Neural
Machine Translation of Rare Words with Subword Units"), the greedy
lowest-rank-first word encoder and the pretokenizer split are the ones
Radford et al. 2019 released with GPT-2's tokenizer. No external tokenizer
libraries are available in this container, so both trainer and encoder are
self-contained (~100 lines) and the merge table ships as a committed JSON
fixture (``tslib_ray/fixtures/bpe_merges.json``).

Reference analogue: none — jehangiramjad/tslib has no tokenizer; this is
part of the LLM-data-pipeline extension surface (SURVEY.md "text analysis").

Two independently-shaped encoders are provided on purpose:

- ``encode_word``        — greedy lowest-rank pair first (GPT-2 runtime
                           algorithm); used by the distributed stage, with a
                           per-actor memo cache over unique pretokens.
- ``encode_word_seq``    — apply merges in TRAINING order, each exhaustively
                           left-to-right (Sennrich's original formulation);
                           used by the sequential VALUES oracle.

For any merge table produced by ``train_merges`` the two are equivalent
(each training step's pair is built exactly when its rank comes up); the
property test in tests/test_round5.py checks this on freshly trained tables,
so the oracle path and the engine path share no encoder code.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

# GPT-2-style pretokenizer, RE2-compatible subset — the SAME pattern
# stages/text.py uses for the pretoken counter, so "real BPE token count"
# is a strict refinement of the existing n_bpe_tokens metric.
from ..stages.text import BPE_SPLIT_PATTERN

FIXTURE_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "fixtures", "bpe_merges.json")


# ---------------------------------------------------------------------------
# training (Sennrich et al. 2016) — deterministic, used once to build the
# committed fixture and inside tests on tiny corpora
# ---------------------------------------------------------------------------

def train_merges(texts, n_merges: int, pattern: str = BPE_SPLIT_PATTERN):
    """Classic BPE training: count pretoken frequencies, then repeatedly
    merge the most frequent adjacent symbol pair. Ties break on the pair
    itself (lexicographic) so training is fully deterministic regardless of
    dict iteration order. Returns the ordered merge list ``[(a, b), ...]``."""
    rx = re.compile(pattern)
    words = Counter()
    for t in texts:
        words.update(rx.findall(t or ""))
    vocab = {tuple(w): c for w, c in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out, i, n = [], 0, len(sym)
            while i < n:
                if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def load_ranks(path: str = FIXTURE_PATH) -> dict:
    """Merge table fixture -> ``{(a, b): rank}`` (lower rank merges first)."""
    with open(path) as f:
        merges = json.load(f)["merges"]
    return {(a, b): r for r, (a, b) in enumerate(merges)}


def encode_word(word: str, ranks: dict) -> list:
    """GPT-2 runtime algorithm: repeatedly merge the present pair with the
    LOWEST rank (all its occurrences, left to right) until no ranked pair
    remains. Characters outside the trained alphabet simply never merge."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_pair = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (parts[i], parts[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i, n = [], 0, len(parts)
        while i < n:
            if i < n - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def encode_word_seq(word: str, merges: list) -> list:
    """Sennrich's formulation: apply each merge in TRAINING order,
    exhaustively left-to-right, one pass per merge. Independent shape from
    ``encode_word`` — the oracle-side encoder."""
    parts = list(word)
    for a, b in merges:
        if len(parts) < 2:
            break
        out, i, n = [], 0, len(parts)
        while i < n:
            if i < n - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def count_tokens_seq(texts, merges: list,
                     pattern: str = BPE_SPLIT_PATTERN) -> list:
    """Sequential per-text REAL-BPE token counts via the training-order
    encoder — the no-Ray oracle path (one process, no caching, no batching)."""
    rx = re.compile(pattern)
    out = []
    for t in texts:
        out.append(sum(len(encode_word_seq(w, merges)) for w in
                       rx.findall(t or "")))
    return out
