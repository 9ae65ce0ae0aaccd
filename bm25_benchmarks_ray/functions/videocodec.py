"""Pure-stdlib Y4M (YUV4MPEG2) video codec.

The container ships no ffmpeg/opencv, but Y4M is a real, widely-used
uncompressed video container (mjpegtools/ffmpeg interchange format)
that is plain-text-headed and trivially parseable: one ASCII header
line, then per-frame ``FRAME\\n`` markers followed by raw planar YUV.
This makes ``decode_backend="real"`` genuinely real for video, the
same way functions/imagecodec.py (PNG/BMP) and functions/audiocodec.py
(WAV) did for images and audio.

Supported colorspaces:
- ``Cmono``  — Y plane only, w*h bytes/frame (lossless round-trip)
- ``C420jpeg`` — full-range 4:2:0, w*h*3//2 bytes/frame (BT.601
  full-range conversion; chroma subsampling is inherently lossy)

All conversions are vectorized numpy over whole frame stacks — no
per-pixel Python.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"


def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n, h, w, 3) uint8 RGB -> (Y (n,h,w), U (n,h/2,w/2), V) uint8,
    BT.601 full-range ("jpeg" levels); chroma is 2x2 box-averaged.
    h and w must be even (Y4M 4:2:0 requires it)."""
    n, h, w, _ = rgb.shape
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dimensions, got {h}x{w}")
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def sub(p: np.ndarray) -> np.ndarray:
        return p.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    return clip(y), clip(sub(u)), clip(sub(v))


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rgb_to_yuv420` (chroma nearest-upsampled)."""
    n, h, w = y.shape
    uf = np.repeat(np.repeat(u, 2, axis=1), 2, axis=2).astype(np.float64) - 128.0
    vf = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2).astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, rate: tuple[int, int] = (25, 1)) -> bytes:
    """Encode a frame stack as Y4M.

    ``frames`` uint8, shape (n, h, w) -> Cmono (lossless), or
    (n, h, w, 3) RGB -> C420jpeg (converted via :func:`rgb_to_yuv420`).
    """
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        n, h, w = frames.shape
        cs = b"mono"
        planes = [frames.reshape(n, -1)]
    elif frames.ndim == 4 and frames.shape[-1] == 3:
        n, h, w, _ = frames.shape
        cs = b"420jpeg"
        y, u, v = rgb_to_yuv420(frames)
        planes = [y.reshape(n, -1), u.reshape(n, -1), v.reshape(n, -1)]
    else:
        raise ValueError(f"expected (n,h,w) or (n,h,w,3), got {frames.shape}")
    header = b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        Y4M_MAGIC, w, h, rate[0], rate[1], cs,
    )
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        for p in planes:
            parts.append(p[i].tobytes())
    return b"".join(parts)


def _parse_header(line: bytes) -> dict:
    fields = line.split(b" ")
    if fields[0] != Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    params: dict = {"C": "420jpeg"}  # Y4M default colorspace is 4:2:0
    for f in fields[1:]:
        if not f:
            continue
        key, val = chr(f[0]), f[1:].decode("ascii")
        if key in ("W", "H"):
            params[key] = int(val)
        else:
            params[key] = val
    if "W" not in params or "H" not in params:
        raise ValueError("Y4M header missing W/H")
    return params


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """Parse a Y4M byte stream.

    Returns ``(frames, meta)``: for Cmono, frames is uint8 (n, h, w)
    Y planes; for C420*, frames is uint8 (n, h, w, 3) RGB (converted
    back via :func:`yuv420_to_rgb`).  meta carries width/height/
    colorspace/rate as parsed.
    """
    nl = data.index(b"\n")
    params = _parse_header(data[:nl])
    w, h, cs = params["W"], params["H"], params["C"]
    mono = cs.startswith("mono")
    if not mono and not cs.startswith("420"):
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    fsz = w * h if mono else w * h * 3 // 2
    pos = nl + 1
    ys, us, vs = [], [], []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M: missing FRAME marker")
        pos = fnl + 1
        if pos + fsz > len(data):
            raise ValueError("truncated Y4M frame")
        buf = np.frombuffer(data, dtype=np.uint8, count=fsz, offset=pos)
        ys.append(buf[: w * h].reshape(h, w))
        if not mono:
            c = w * h // 4
            us.append(buf[w * h : w * h + c].reshape(h // 2, w // 2))
            vs.append(buf[w * h + c :].reshape(h // 2, w // 2))
        pos += fsz
    meta = {
        "width": w, "height": h, "colorspace": cs,
        "rate": params.get("F", "25:1"), "n_frames": len(ys),
    }
    if mono:
        return np.stack(ys) if ys else np.empty((0, h, w), np.uint8), meta
    if not ys:
        return np.empty((0, h, w, 3), np.uint8), meta
    return yuv420_to_rgb(np.stack(ys), np.stack(us), np.stack(vs)), meta


def sniff_y4m(data: bytes) -> bool:
    return data[: len(Y4M_MAGIC)] == Y4M_MAGIC
