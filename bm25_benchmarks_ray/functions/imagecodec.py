"""Pure-stdlib image codecs: PNG (zlib + numpy unfilter) and 24-bit BMP.

A real decode path for the multimodal pipeline without PIL/opencv
(neither is in this container): PNG is RFC-2083 — zlib-compressed
scanlines with five per-row filters — and stdlib ``zlib`` plus numpy
covers it completely for the common pixel layouts (8-bit gray / RGB /
RGBA).  BMP (Windows V3, 24-bit uncompressed) is a plain pixel grid.

Decoding is vectorized where the format allows: whole-image inflate,
row-at-a-time unfiltering (the Up filter is a pure numpy op; Sub /
Average / Paeth have a sequential data dependency along the row and run
as a compiled-friendly per-pixel recurrence only on rows that use
them).  Our own encoder emits filter 0 (None), so round-trip pipelines
stay on the fully-vectorized path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def sniff_format(data: bytes) -> str | None:
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    return None


# -- PNG ---------------------------------------------------------------

def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, filter 0, one IDAT."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8.  Supports 8-bit depth, color types
    0/2/4/6, no interlace — the layouts real pipelines emit."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG layout (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            c = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — vectorized
            out[y] = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = line[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(int(a), int(b), int(cc))
                line[x] = (cur[x] + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, c)


# -- BMP (Windows V3, 24-bit, uncompressed) ----------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP (bottom-up, BGR, 4-byte pad)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP writer: RGB only")
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    pad = (-row) % 4
    body = np.frombuffer(
        data[offset : offset + h * (row + pad)], dtype=np.uint8
    ).reshape(h, row + pad)[:, :row]
    img = body.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; always returns (h, w, 3) uint8 RGB."""
    fmt = sniff_format(bytes(data[:8]))
    if fmt == "png":
        img = decode_png(data)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 2:  # gray + alpha: drop alpha, expand
            img = np.repeat(img[:, :, :1], 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        return img
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError("unknown image format (PNG and 24-bit BMP supported)")
