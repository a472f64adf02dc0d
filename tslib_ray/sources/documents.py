"""Deterministic synthetic document corpus at parameterized scale.

Schema matches the driver's ``documents`` table surface used by the dedup /
text stack: ``(doc_id:int64, text:string)``. Every token is a pure hash
function of ``(seed, effective_doc, position)``, so the corpus is
byte-identical at any parallelism; a ``dup_frac`` tail of docs are planted
near-copies of earlier docs (same token stream with a few substitutions),
giving MinHash/SimHash/exact dedup a known answer at any scale.

Generation is Arrow-vectorized: token ids -> dictionary ``take`` ->
``pc.binary_join`` (no per-row Python string building), so the generator
itself sustains millions of docs/min and never bottlenecks a bench.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .transcripts import _hash_uniform

# compact pronounceable vocabulary: v0..v{V-1} style tokens built once
_VOCAB_SIZE = 2000
_SYL = ("ba", "do", "ke", "li", "mu", "no", "pi", "ra", "su", "te",
        "vo", "wa", "ze", "chi", "fa", "gu")


def _vocab(n: int = _VOCAB_SIZE) -> pa.Array:
    words = []
    for i in range(n):
        w, x = "", i + 1
        while x:
            w += _SYL[x % len(_SYL)]
            x //= len(_SYL)
        words.append(w)
    return pa.array(words)


def _gen_doc_block(ids: np.ndarray, seed: int, mean_tokens: int,
                   dup_frac: float, vocab: pa.Array) -> pa.Table:
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    # dup tail: the last dup_frac of the id space copies an earlier doc
    n_total_guess = ids.max() + 1 if n else 0
    is_dup = _hash_uniform(ids * 11 + 3, np.full_like(ids, seed)) < dup_frac
    src = (_hash_uniform(ids * 17 + 9, np.full_like(ids, seed + 1))
           * np.maximum(ids, 1)).astype(np.int64)
    eff = np.where(is_dup & (ids > 0), src, ids)
    lens = (mean_tokens // 2
            + (_hash_uniform(eff * 5 + 1, np.full_like(eff, seed))
               * mean_tokens).astype(np.int64))
    total = int(lens.sum())
    doc_of = np.repeat(np.arange(n), lens)
    pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    tok = (_hash_uniform(np.repeat(eff, lens) * 1_000_003 + pos,
                         np.full(total, seed + 2))
           * len(vocab)).astype(np.int64)
    # one id-dependent substitution makes each dup a NEAR-copy: distinct
    # from its source AND from sibling copies, with 3-shingle Jaccard to the
    # source ~ (L-3)/(L+3) in [0.82, 0.95] across the length range — above
    # the standard 0.8 near-dup threshold
    dup_rep = np.repeat(is_dup & (ids > 0), lens)
    mutate = dup_rep & (pos == 0)
    delta = np.repeat(ids % 13 + 1, lens)
    tok = np.where(mutate, (tok + delta) % len(vocab), tok)
    words = pc.take(vocab, pa.array(tok))
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    text = pc.binary_join(lists, " ")
    return pa.table({"doc_id": pa.array(ids), "text": text})


def synth_documents(n_docs: int, mean_tokens: int = 60,
                    dup_frac: float = 0.05, seed: int = 42,
                    parallelism: int = -1) -> "rd.Dataset":
    """Streaming deterministic synthetic corpus."""
    vocab = _vocab()

    def gen(batch: pa.Table) -> pa.Table:
        return _gen_doc_block(batch["id"].to_numpy(), seed, mean_tokens,
                              dup_frac, vocab)

    seeds = rd.range(n_docs, override_num_blocks=parallelism
                     if parallelism > 0 else None)
    return seeds.map_batches(gen, batch_format="pyarrow", batch_size=8192)
