"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``/``duration``). The
decode / feature-extraction kernels are STUBBED (no image/audio libraries in
this container — clearly marked below); everything Ray-side is real and
tested: schema, actor-pool stage shape, small batch sizes for wide binary
rows, Arrow-only batches (binary columns must not round-trip through pandas
object dtype — ray_guide pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.transcripts import _splitmix64


def synth_media(n_rows: int, payload_bytes: int = 4096,
                seed: int = 42) -> "rd.Dataset":
    """Deterministic fake media table: (media_id, media_type, payload,
    width, height). Payload bytes are a hash-stream — stands in for real
    encoded images at the same shuffle/memory cost."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        n_words = payload_bytes // 8
        payloads = [payload_words(i, n_words, seed).tobytes() for i in ids]
        mt = np.where(ids % 3 == 0, "image/png",
                      np.where(ids % 3 == 1, "image/jpeg", "audio/wav"))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array(mt),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array((ids % 640 + 32).astype(np.int32)),
            "height": pa.array((ids % 480 + 32).astype(np.int32)),
        })

    # small batches: wide binary rows (payload dominates block size)
    return rd.range(n_rows).map_batches(gen, batch_format="pyarrow",
                                        batch_size=256)


def payload_words(media_id: int, n_words: int, seed: int) -> np.ndarray:
    """Deterministic payload stream for one media id (shared by the Ray
    generator and the sequential oracle builder)."""
    return _splitmix64(np.arange(n_words, dtype=np.int64)
                       + np.int64(media_id) * 1_000_003 + seed)


def _features_matrix(n: int, lengths: np.ndarray, row_of: np.ndarray,
                     flat: np.ndarray, within: np.ndarray):
    """(entropy, stride-mean) per row — the ONE kernel both the actor stage
    and the sequential oracle call, so summation order is bit-identical on
    both sides (ADVICE r04: the oracle's compacted nonzero-bin sum vs the
    batched 256-bin sum can differ in the last ulp and flip the round(.,6)
    compare on knife-edge payloads).

    ``lengths``: per-row byte counts; ``row_of``: row index per byte;
    ``flat``: the gathered uint8 bytes; ``within``: byte position within
    its row."""
    hist = np.bincount(row_of * 256 + flat.astype(np.int64),
                       minlength=n * 256).reshape(n, 256).astype(np.float64)
    p = hist / np.maximum(lengths, 1)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(p > 0, p * np.log2(p, where=p > 0), 0.0).sum(1)
    stride = within % 8 == 0
    ssum = np.bincount(row_of[stride], weights=flat[stride], minlength=n)
    scnt = np.maximum(np.bincount(row_of[stride], minlength=n), 1)
    smean = np.where(lengths > 0, ssum / scnt, 0.0)
    return ent, smean


def byte_features(buf: bytes) -> tuple[float, float, float]:
    """(n_bytes, byte-histogram entropy, 8-byte-stride mean) of a payload —
    the deterministic stand-in feature kernel, shared by the actor stage and
    the sequential oracle. Delegates to :func:`_features_matrix` with n=1 so
    the float op order matches the batched path exactly."""
    b = np.frombuffer(buf, dtype=np.uint8)
    ent, smean = _features_matrix(
        1, np.array([b.size], dtype=np.int64),
        np.zeros(b.size, dtype=np.int64), b,
        np.arange(b.size, dtype=np.int64))
    return (float(b.size), float(ent[0]), float(smean[0]))


def _decode_image_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real implementation would be e.g. PIL/libvips decode. The
    container has no image libraries, so this raises unless the deterministic
    fake path is used. Marked per the build contract."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; use deterministic_features=True for the fake path")


class MediaFeatures:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``deterministic_features=True`` (default here) computes real features of
    the *bytes* (length, byte-histogram entropy, 8-byte-stride moments) —
    a stand-in with the same plumbing cost as a model forward pass. With
    ``False`` it calls the decode stub and raises, documenting exactly where
    a real decoder plugs in.
    """

    def __init__(self, deterministic_features: bool = True):
        self.deterministic = deterministic_features
        # per-actor setup (the "load model once" slot)
        self.hist_bins = np.arange(257)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if not self.deterministic and n:  # empty blocks must pass through,
            # not IndexError on payload[0] (ADVICE r04)
            _decode_image_stub(batch["payload"][0].as_py(),
                               batch["media_type"][0].as_py())
        # fully vectorized over the batch (VERDICT r03 item 5 — this was
        # the last per-row Python loop in an actor stage): gather every
        # payload into ONE uint8 buffer via the Arrow offsets, then batch
        # histograms/means with bincount over (row * 256 + byte)
        arr = batch["payload"].combine_chunks()
        if pa.types.is_large_binary(arr.type):
            arr = arr.cast(pa.binary())
        bufs = arr.buffers()  # [validity, int32 offsets, byte values]
        offs = np.frombuffer(bufs[1], dtype=np.int32)[
            arr.offset: arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        lengths = offs[1:] - offs[:-1]
        total = int(lengths.sum())
        row_base = np.repeat(np.cumsum(lengths) - lengths, lengths)
        within = np.arange(total, dtype=np.int64) - row_base
        take = np.repeat(offs[:-1], lengths) + within  # offset-safe gather
        flat = data[take]
        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        # shared kernel with the sequential oracle (bit-identical op order)
        ent, smean = _features_matrix(n, lengths, row_of, flat, within)
        return batch.drop_columns(["payload"]).append_column(
            "n_bytes", pa.array(lengths.astype(np.float64))
        ).append_column(
            "byte_entropy", pa.array(np.round(ent, 6))
        ).append_column(
            "stride_mean", pa.array(np.round(smean, 6)))


def media_features(media: "rd.Dataset", concurrency: int = 2,
                   batch_size: int = 128) -> "rd.Dataset":
    """Feature extraction over media payloads (actor pool, Arrow-only)."""
    return media.map_batches(MediaFeatures, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)
