"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

All three decode paths are REAL under ``decode_backend="real"``:
images dispatch on magic bytes to the pure-stdlib PNG / 24-bit BMP
codec (functions/imagecodec.py), audio is 16-bit PCM WAV via stdlib
``wave`` (functions/audiocodec.py), and video is YUV4MPEG2 (Y4M)
(functions/videocodec.py) — no PIL/opencv/ffmpeg needed.  The
deterministic fake backend derives pixel/sample content from the
payload bytes so every downstream stage (resize, feature extract,
frame sample) runs real numpy on real arrays either way.

Batch-size note (100 TB): binary payloads dominate block size; keep
``batch_size`` small (default 64) so batch × concurrency fits worker
heaps, and let the object store spill blocks — never hold Python lists
of decoded frames across batches.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import ray.data as rd


def _u8_list_array(arrays: list[np.ndarray]) -> pa.ListArray:
    """list<uint8> column from numpy buffers: one concatenate + offsets,
    no per-row Python lists."""
    if not arrays:
        return pa.array([], type=pa.list_(pa.uint8()))
    offsets = np.zeros(len(arrays) + 1, dtype=np.int32)
    np.cumsum([a.size for a in arrays], out=offsets[1:])
    values = pa.array(np.concatenate(arrays), type=pa.uint8())
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def _u8_list_rows(col: pa.ChunkedArray | pa.ListArray):
    """Zero-copy (values, offsets) view of a list<uint8> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.values.to_numpy(), col.offsets.to_numpy()

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),       # JSON: {width,height}|{sample_rate,n_samples}|{n_frames,...}
    ]
)


def synthesize_media(
    n: int, seed: int = 9, image_format: str = "raw", audio_format: str = "raw",
    video_format: str = "raw",
) -> pa.Table:
    """Deterministic fake media table: payload bytes derived from
    (seed, media_id); metadata consistent with payload length.
    image_format="png"/"bmp" emits REAL encoded image payloads,
    audio_format="wav" REAL 16-bit PCM WAV, and video_format="y4m"
    REAL mono YUV4MPEG2 streams (for the real decode backends); "raw"
    keeps bare pixel/sample/frame bytes (fake backend)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.randint(0, 3, size=n)
    ]
    payloads, metas = [], []
    for i, kind in enumerate(kinds):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        if kind == "image":
            w, hgt = 8 + h[0] % 24, 8 + h[1] % 24
            pix = (h * ((w * hgt * 3) // len(h) + 1))[: w * hgt * 3]
            if image_format == "raw":
                payloads.append(pix)
            else:
                from ..functions.imagecodec import encode_bmp, encode_png

                img = np.frombuffer(pix, dtype=np.uint8).reshape(hgt, w, 3)
                payloads.append(
                    encode_png(img) if image_format == "png" else encode_bmp(img)
                )
            metas.append(json.dumps({"width": w, "height": hgt}))
        elif kind == "audio":
            ns = 256 + h[0] * 4
            pcm = (h * ((ns * 2) // len(h) + 1))[: ns * 2]
            if audio_format == "wav":
                from ..functions.audiocodec import encode_wav

                payloads.append(
                    encode_wav(np.frombuffer(pcm, dtype=np.int16), 16000)
                )
            else:
                payloads.append(pcm)
            metas.append(json.dumps({"sample_rate": 16000, "n_samples": ns}))
        else:
            nf = 4 + h[0] % 12
            if video_format == "y4m":
                from ..functions.videocodec import encode_y4m

                w, hgt = 8 + h[2] % 8, 8 + h[3] % 8
                raw = (h * ((nf * hgt * w) // len(h) + 1))[: nf * hgt * w]
                frames = np.frombuffer(raw, dtype=np.uint8).reshape(nf, hgt, w)
                payloads.append(encode_y4m(frames))
                metas.append(
                    json.dumps({"n_frames": nf, "width": w, "height": hgt})
                )
            else:
                payloads.append((h * ((nf * 64) // len(h) + 1))[: nf * 64])
                metas.append(json.dumps({"n_frames": nf, "frame_bytes": 64}))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor stage: image payload → (media_id, width, height, pixels
    list<uint8>).  Real decoder slots in behind decode_backend."""

    def __init__(self, decode_backend: str = "fake"):
        self.backend = decode_backend

    def _decode(self, payload: bytes, meta: dict) -> np.ndarray:
        if self.backend == "real":
            from ..functions.imagecodec import decode_image

            return decode_image(payload)
        w, h = meta["width"], meta["height"]
        return np.frombuffer(payload[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, px = [], [], [], []
        for mid, kind, payload, meta_s in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            if kind != "image":
                continue
            meta = json.loads(meta_s)
            img = self._decode(payload, meta)
            ids.append(mid)
            ws.append(img.shape[1])
            hs.append(img.shape[0])
            px.append(img.reshape(-1))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "pixels": _u8_list_array(px),
            }
        )


class ResizeImage:
    """Actor stage: nearest-neighbor resize to (target, target) — real
    numpy on decoded pixel arrays (works identically under a real
    decoder)."""

    def __init__(self, target: int = 8):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        values, offsets = _u8_list_rows(batch.column("pixels"))
        out = []
        for i, (w, h) in enumerate(
            zip(batch.column("width").to_pylist(), batch.column("height").to_pylist())
        ):
            img = values[offsets[i] : offsets[i + 1]].reshape(h, w, 3)
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            out.append(img[yi, xi].reshape(-1))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array([t] * batch.num_rows, type=pa.int32()),
                "height": pa.array([t] * batch.num_rows, type=pa.int32()),
                "pixels": _u8_list_array(out),
            }
        )


class AudioFeatures:
    """Actor stage: audio payload → fixed-size energy features per
    window (fake decode: int16 samples from payload bytes)."""

    def __init__(self, n_windows: int = 16, decode_backend: str = "fake"):
        self.n_windows = n_windows
        self.backend = decode_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            if self.backend == "real":
                from ..functions.audiocodec import wav_to_mono_f64

                samples, _rate = wav_to_mono_f64(payload)
            else:
                samples = np.frombuffer(
                    payload[: (len(payload) // 2) * 2], dtype=np.int16
                ).astype(np.float64)
            w = max(1, samples.size // self.n_windows)
            trimmed = samples[: w * self.n_windows]
            energy = np.sqrt((trimmed.reshape(-1, w) ** 2).mean(axis=1))
            ids.append(mid)
            feats.append(np.round(energy, 4))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64())),
            }
        )


class SampleFrames:
    """Actor stage: video payload → every k-th frame as binary rows
    (one output row per sampled frame).

    decode_backend="real" parses Y4M streams (functions/videocodec.py)
    — width/height/frame count come from the container itself and each
    emitted frame is that frame's raw pixel bytes.  The fake backend
    slices the payload into meta-declared fixed-size byte frames
    (width=frame_bytes, height=1)."""

    def __init__(self, every: int = 2, decode_backend: str = "fake"):
        self.every = every
        self.backend = decode_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, frames = [], [], [], [], []
        for mid, kind, payload, meta_s in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            if kind != "video":
                continue
            if self.backend == "real":
                from ..functions.videocodec import decode_y4m

                dec, meta = decode_y4m(payload)
                for i in range(0, meta["n_frames"], self.every):
                    ids.append(mid)
                    fidx.append(i)
                    ws.append(meta["width"])
                    hs.append(meta["height"])
                    frames.append(dec[i].tobytes())
                continue
            meta = json.loads(meta_s)
            fb, nf = meta["frame_bytes"], meta["n_frames"]
            for i in range(0, nf, self.every):
                ids.append(mid)
                fidx.append(i)
                ws.append(fb)
                hs.append(1)
                frames.append(payload[i * fb : (i + 1) * fb])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def image_pipeline(ds: rd.Dataset, target: int = 8, concurrency=(1, 4)) -> rd.Dataset:
    """decode → resize, both actor pools, small batches for binaries."""
    return ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    ).map_batches(
        ResizeImage,
        fn_constructor_args=(target,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
