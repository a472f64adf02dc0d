"""Gorilla-style time-series tile codec: delta-of-delta timestamps + XOR
float values, bit-packed (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 — see PAPERS.md).

This is the engine's tier-tile compression: each ``(conv_id, metric, tier)``
group's sorted points become binary tile columns ``(ts_blob, val_blob)``.
The reference has no codec (tslib keeps dense matrices in RAM / HDF5 —
``/root/reference/src/hdf_util.py``); this is a from-scratch engine component
required by the north rule.

Deviations from the VLDB paper, chosen for vectorizability (encode is pure
numpy — no per-point Python in the hot path):

- timestamps are int64 microseconds with wider delta-of-delta buckets
  (7/12/20/32/64-bit payloads; prefix codes ``0|10|110|1110|11110|11111``)
  instead of the paper's seconds-oriented 7/9/12/32;
- XOR'd values always emit an explicit (leading-zeros, significant-bits)
  window: control ``0`` when XOR==0, else ``1`` + 6-bit leading-zero count +
  6-bit (sigbits-1) + sigbits of payload. The paper's "reuse previous window"
  control (``10``) is dropped — slightly larger output, branch-free encode.

Decode is sequential by nature (variable-length codes); it reads through a
64-bit word cursor and sits on the read path / roundtrip tests, not in the
write hot path.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = (1 << 64) - 1

# (lo, hi, payload_bits, prefix_value, prefix_len); payload = dod - lo
_TS_BUCKETS = (
    (-63, 64, 7, 0b10, 2),
    (-2047, 2048, 12, 0b110, 3),
    (-524287, 524288, 20, 0b1110, 4),
    (-(2**31 - 1), 2**31, 32, 0b11110, 5),
)
_TS_WIDE_PREFIX, _TS_WIDE_PLEN = 0b11111, 5


def _pack_bits(codes: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate variable-width big-endian bitfields (``codes`` uint64,
    ``nbits`` int64; width 0 contributes nothing). Fully vectorized."""
    nbits = np.asarray(nbits, dtype=np.int64)
    codes = np.asarray(codes, dtype=np.uint64)
    keep = nbits > 0
    codes, nbits = codes[keep], nbits[keep]
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    starts = ends - nbits
    elem = np.repeat(np.arange(len(codes)), nbits)
    j = np.arange(total) - starts[elem]
    shift = (nbits[elem] - 1 - j).astype(np.uint64)
    bits = ((codes[elem] >> shift) & _U64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _BitReader:
    """Cursor over a big-endian bitstream, reading via 64-bit words."""

    def __init__(self, buf: bytes):
        pad = (-len(buf)) % 8
        self.words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8")
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        w, off = divmod(self.pos, 64)
        self.pos += n
        avail = 64 - off
        take = min(n, avail)
        first = (int(self.words[w]) >> (avail - take)) & ((1 << take) - 1)
        if n <= avail:
            return first
        rest = n - avail
        return (first << rest) | (int(self.words[w + 1]) >> (64 - rest))


# --------------------------------------------------------------------------
# timestamps
# --------------------------------------------------------------------------

def encode_timestamps(ts: np.ndarray) -> bytes:
    """Encode sorted int64 timestamps (µs). Layout: ``[n:32][ts0:64]
    [delta0:64][dod codes...]`` with delta-of-delta prefix codes."""
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    codes = [np.array([n], dtype=np.uint64)]
    bits = [np.array([32], dtype=np.int64)]
    if n >= 1:
        codes.append(ts[:1].astype(np.uint64))
        bits.append(np.array([64], dtype=np.int64))
    if n >= 2:
        deltas = np.diff(ts)
        codes.append(deltas[:1].astype(np.uint64))
        bits.append(np.array([64], dtype=np.int64))
    if n >= 3:
        dod = np.diff(deltas)
        m = dod.size
        # two interleaved entries per point: [prefix][payload]
        pc = np.zeros(m, dtype=np.uint64)   # prefix code
        pl = np.zeros(m, dtype=np.int64)    # prefix len
        yc = np.zeros(m, dtype=np.uint64)   # payload code
        yl = np.zeros(m, dtype=np.int64)    # payload len
        done = dod == 0
        pc[done], pl[done] = 0, 1
        for lo, hi, pbits, pfx, plen in _TS_BUCKETS:
            sel = (~done) & (dod >= lo) & (dod <= hi)
            pc[sel], pl[sel] = pfx, plen
            yc[sel] = (dod[sel] - lo).astype(np.uint64)
            yl[sel] = pbits
            done |= sel
        wide = ~done
        pc[wide], pl[wide] = _TS_WIDE_PREFIX, _TS_WIDE_PLEN
        yc[wide] = dod[wide].astype(np.uint64)  # two's complement
        yl[wide] = 64
        inter_c = np.empty(2 * m, dtype=np.uint64)
        inter_b = np.empty(2 * m, dtype=np.int64)
        inter_c[0::2], inter_c[1::2] = pc, yc
        inter_b[0::2], inter_b[1::2] = pl, yl
        codes.append(inter_c)
        bits.append(inter_b)
    return _pack_bits(np.concatenate(codes), np.concatenate(bits))


def decode_timestamps(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_timestamps`."""
    r = _BitReader(buf)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = t0 - (1 << 64) if t0 >= (1 << 63) else t0
    if n == 1:
        return out
    d = r.read(64)
    delta = d - (1 << 64) if d >= (1 << 63) else d
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            bucket = None
            for lo, hi, pbits, _pfx, _plen in _TS_BUCKETS:
                if r.read(1) == 0:
                    bucket = (lo, pbits)
                    break
            if bucket is not None:
                lo, pbits = bucket
                dod = r.read(pbits) + lo
            else:
                v = r.read(64)
                dod = v - (1 << 64) if v >= (1 << 63) else v
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# --------------------------------------------------------------------------
# float values
# --------------------------------------------------------------------------

def encode_values(vals: np.ndarray) -> bytes:
    """Encode float64 values. Layout: ``[n:32][v0:64][xor codes...]`` with
    control ``0`` (XOR==0) or ``1`` + lz:6 + (sigbits-1):6 + payload."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    bits_v = vals.view(np.uint64)
    n = vals.size
    codes = [np.array([n], dtype=np.uint64)]
    bits = [np.array([32], dtype=np.int64)]
    if n >= 1:
        codes.append(bits_v[:1])
        bits.append(np.array([64], dtype=np.int64))
    if n >= 2:
        x = bits_v[1:] ^ bits_v[:-1]
        m = x.size
        nz = x != 0
        # 64-bit leading/trailing zero counts (vectorized via float64 log2 is
        # unsafe; use bit-smearing for lz and the de Bruijn-free tz below)
        lz = np.zeros(m, dtype=np.int64)
        tz = np.zeros(m, dtype=np.int64)
        if nz.any():
            xv = x[nz]
            # leading zeros: smear highest set bit down, then popcount
            y = xv.copy()
            for s in (1, 2, 4, 8, 16, 32):
                y |= y >> _U64(s)
            lz[nz] = 64 - _popcount64(y)
            # trailing zeros: isolate lowest set bit, popcount(low-1)
            low = xv & (~xv + _U64(1))
            tz[nz] = _popcount64(low - _U64(1))
        sig = np.where(nz, 64 - lz - tz, 1)
        # control+lz+sigbits header (13 bits) then payload (sig bits)
        hdr = np.where(
            nz,
            (np.uint64(1) << _U64(12))
            | (lz.astype(np.uint64) << _U64(6))
            | (sig - 1).astype(np.uint64),
            0,
        ).astype(np.uint64)
        hlen = np.where(nz, 13, 1)
        payload = np.where(nz, x >> tz.astype(np.uint64), 0).astype(np.uint64)
        plen = np.where(nz, sig, 0)
        inter_c = np.empty(2 * m, dtype=np.uint64)
        inter_b = np.empty(2 * m, dtype=np.int64)
        inter_c[0::2], inter_c[1::2] = hdr, payload
        inter_b[0::2], inter_b[1::2] = hlen, plen
        codes.append(inter_c)
        bits.append(inter_b)
    return _pack_bits(np.concatenate(codes), np.concatenate(bits))


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    a = a.astype(np.uint64)
    a = a - ((a >> _U64(1)) & _U64(0x5555555555555555))
    a = (a & _U64(0x3333333333333333)) + ((a >> _U64(2)) & _U64(0x3333333333333333))
    a = (a + (a >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((a * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def decode_values(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_values` (bit-exact, NaN-safe)."""
    r = _BitReader(buf)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lz = r.read(6)
        sig = r.read(6) + 1
        payload = r.read(sig)
        tz = 64 - lz - sig
        prev = prev ^ ((payload << tz) & _MASK64)
        out[i] = prev
    return out.view(np.float64)


# --------------------------------------------------------------------------
# tile convenience API
# --------------------------------------------------------------------------

def encode_tile(ts: np.ndarray, vals: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one sorted series tile -> ``(ts_blob, val_blob)``."""
    if len(ts) != len(vals):
        raise ValueError("ts and vals must be the same length")
    return encode_timestamps(ts), encode_values(vals)


def decode_tile(ts_blob: bytes, val_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one tile -> ``(ts int64[µs], values float64)``."""
    return decode_timestamps(ts_blob), decode_values(val_blob)
