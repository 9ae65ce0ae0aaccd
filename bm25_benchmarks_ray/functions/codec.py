"""Delta + varint posting-list codec, numpy-vectorized both ways.

Segment rows store doc_ids as delta-encoded LEB128 varints and the
per-posting float32 shape values as raw little-endian bytes — the same
layout family as PISA-style compressed posting lists the reference
drives (/root/reference/benchmark/on_pisa.py:33-51), chosen over Arrow
list<int64> because gaps between sorted doc_ids are tiny at high df
(hot terms ~1 byte/posting instead of 8).

Encode: ~10 vectorized passes (one per possible varint byte position).
Decode: one pass of segmented bit-assembly with ``np.add.at``.  No
Python per-element loops anywhere.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value.  One whole-array max bounds
    the threshold loop: posting streams are overwhelmingly small values
    (tf≈1-3, dl≈20-30, dense doc gaps), so most streams pay 0-2
    comparison passes instead of all nine."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    if v.size == 0:
        return nbytes
    vmax = v.max()
    for t in _THRESHOLDS:
        if vmax < t:
            break
        nbytes += (v >= t).astype(np.int64)
    return nbytes


def varint_encode_with_offsets(
    values: np.ndarray, block_size: int
) -> tuple[bytes, np.ndarray]:
    """LEB128-encode plus the byte offset of every block_size-th value —
    the random-access skip table that lets a reader decode only the
    blocks covering a doc range (uint32 offsets, one per block)."""
    buf, bounds = varint_encode_bounds(values)
    v_size = bounds.size - 1
    if v_size == 0:
        return buf, np.empty(0, dtype=np.uint32)
    return buf, bounds[:-1][::block_size].astype(np.uint32)


def varint_encode_bounds(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode plus the byte offset of every VALUE boundary
    (length n+1, starting at 0) — one nbytes pass shared between the
    encoder and the offset table (callers previously paid
    ``varint_nbytes`` twice per stream)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = varint_nbytes(v)
    ends = np.cumsum(nbytes)
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    starts = ends - nbytes
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        vj = v[mask]
        byte = ((vj >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = byte | cont
    bounds = np.empty(ends.size + 1, dtype=np.int64)
    bounds[0] = 0
    bounds[1:] = ends
    return out.tobytes(), bounds


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    return varint_encode_bounds(values)[0]


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if is_last.all():
        # every value fits one byte (tf≈1, small dls, dense doc gaps —
        # the overwhelmingly common posting streams): skip the
        # general path's five extra array passes
        return b.astype(np.uint64)
    # one fancy-indexed pass per byte POSITION over the (shrinking) set
    # of values that long — mirrors the encoder's shape and avoids
    # np.add.at over every byte (the scatter-add was ~10x slower than
    # these gather passes on 2-byte-heavy dl streams)
    inner = np.flatnonzero(is_last[:-1]) + 1  # value starts after byte 0
    n = inner.size + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = inner
    nb = np.empty(n, dtype=np.int64)  # bytes per value
    np.subtract(starts[1:], starts[:-1], out=nb[:-1])
    nb[-1] = b.size - starts[-1]
    out = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    for j in range(1, int(nb.max())):
        m = nb > j
        out[m] |= (b[starts[m] + j] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


def delta_encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Encode a strictly-increasing int64 doc_id array as gap varints
    (first value absolute)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty(d.size, dtype=np.uint64)
    gaps[0] = np.uint64(d[0])
    np.subtract(d[1:], d[:-1], out=gaps[1:].view(np.int64), casting="unsafe")
    return varint_encode(gaps)


def delta_decode_doc_ids(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))


def f32_encode(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.float32).tobytes()


def f32_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float32)


def u32_encode(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.uint32).tobytes()


def u32_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint32)
