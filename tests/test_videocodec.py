"""Y4M codec: real container round-trips (mono lossless, 420 within
chroma-subsampling tolerance) and the SampleFrames real backend."""

from __future__ import annotations

import json

import numpy as np
import pytest

from bm25_benchmarks_ray.functions.videocodec import (
    decode_y4m,
    encode_y4m,
    rgb_to_yuv420,
    sniff_y4m,
    yuv420_to_rgb,
)


def test_mono_roundtrip_exact():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(5, 12, 16), dtype=np.uint8)
    data = encode_y4m(frames, rate=(30, 1))
    assert sniff_y4m(data)
    out, meta = decode_y4m(data)
    np.testing.assert_array_equal(out, frames)
    assert meta["width"] == 16 and meta["height"] == 12
    assert meta["n_frames"] == 5 and meta["colorspace"].startswith("mono")
    assert meta["rate"] == "30:1"


def test_420_roundtrip_tolerance():
    rng = np.random.RandomState(7)
    # smooth gradients: chroma subsampling error stays small
    base = np.linspace(60, 120, 16, dtype=np.uint8)  # gentle gradient:
    # 2x2 chroma box-averaging error stays ~2/255
    frames = np.zeros((3, 8, 16, 3), dtype=np.uint8)
    for i in range(3):
        frames[i, :, :, 0] = base[None, :]
        frames[i, :, :, 1] = base[::-1][None, :]
        frames[i, :, :, 2] = 10 * i
    data = encode_y4m(frames)
    out, meta = decode_y4m(data)
    assert out.shape == frames.shape
    assert meta["colorspace"].startswith("420")
    assert np.abs(out.astype(int) - frames.astype(int)).mean() < 3


def test_yuv_conversion_identities():
    # grayscale RGB maps to Y == gray, U == V == 128 (no chroma)
    g = np.full((1, 4, 4, 3), 77, dtype=np.uint8)
    y, u, v = rgb_to_yuv420(g)
    assert (y == 77).all() and (u == 128).all() and (v == 128).all()
    back = yuv420_to_rgb(y, u, v)
    np.testing.assert_array_equal(back, g)


def test_header_and_errors():
    frames = np.zeros((1, 4, 4), dtype=np.uint8)
    data = encode_y4m(frames)
    assert data.startswith(b"YUV4MPEG2 W4 H4 ")
    with pytest.raises(ValueError):
        decode_y4m(b"NOTAY4M W4 H4\n")
    with pytest.raises(ValueError):
        decode_y4m(data[:-3])  # truncated frame
    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((1, 3, 4, 3), dtype=np.uint8))  # odd h
    # odd frame-stack shape
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((2, 2), dtype=np.uint8))


def test_empty_stream():
    out, meta = decode_y4m(b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 Cmono\n")
    assert out.shape == (0, 4, 6) and meta["n_frames"] == 0


def test_sample_frames_real_backend_local():
    """Drive SampleFrames.__call__ directly (no Ray) on real Y4M."""
    from bm25_benchmarks_ray.pipelines.multimodal import (
        SampleFrames,
        synthesize_media,
    )

    tbl = synthesize_media(40, seed=5, video_format="y4m")
    out = SampleFrames(every=2, decode_backend="real")(tbl)
    vids = {
        mid: json.loads(m)
        for mid, k, m in zip(
            tbl.column("media_id").to_pylist(),
            tbl.column("kind").to_pylist(),
            tbl.column("meta").to_pylist(),
        )
        if k == "video"
    }
    assert out.num_rows == sum(
        len(range(0, m["n_frames"], 2)) for m in vids.values()
    )
    pay = {
        mid: p
        for mid, p in zip(
            tbl.column("media_id").to_pylist(),
            tbl.column("payload").to_pylist(),
        )
    }
    for mid, fi, w, h, frame in zip(
        out.column("media_id").to_pylist(),
        out.column("frame_idx").to_pylist(),
        out.column("width").to_pylist(),
        out.column("height").to_pylist(),
        out.column("frame").to_pylist(),
    ):
        meta = vids[mid]
        assert (w, h) == (meta["width"], meta["height"])
        assert len(frame) == w * h
        # frame content matches a direct decode of the payload
        dec, _ = decode_y4m(pay[mid])
        assert frame == dec[fi].tobytes()
