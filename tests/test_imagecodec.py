"""Pure-stdlib PNG/BMP codec round-trips + the real decode backend
through the Ray image pipeline."""

from __future__ import annotations

import numpy as np
import pytest
import zlib

from bm25_benchmarks_ray.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    sniff_format,
)


def _img(h, w, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (16, 16), (11, 3)])
def test_png_roundtrip_rgb(shape):
    img = _img(*shape)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_gray_and_rgba():
    g = _img(6, 9, 1, seed=1)
    np.testing.assert_array_equal(decode_png(encode_png(g)), g)
    rgba = _img(4, 5, 4, seed=2)
    np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_all_filters_decode():
    """Hand-build a PNG using every filter type (Sub/Up/Average/Paeth)
    and check against a reference unfilter."""
    import struct

    h, w, c = 5, 4, 3
    img = _img(h, w, c, seed=3)
    stride = w * c
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int32)
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), img)


@pytest.mark.parametrize("shape", [(3, 3), (8, 5), (7, 6)])
def test_bmp_roundtrip(shape):
    img = _img(*shape, seed=4)
    out = decode_bmp(encode_bmp(img))
    np.testing.assert_array_equal(out, img)


def test_sniff_and_dispatch():
    img = _img(4, 4)
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(encode_bmp(img)) == "bmp"
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    np.testing.assert_array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_real_decode_backend_pipeline(ray_session, fmt):
    """Real decode end-to-end: synthesized real-format payloads through
    the actor-pool decode + resize pipeline."""
    import ray.data as rd

    from bm25_benchmarks_ray.pipelines.multimodal import (
        DecodeImage,
        ResizeImage,
        synthesize_media,
    )

    t = synthesize_media(30, seed=11, image_format=fmt)
    ds = rd.from_arrow(t).map_batches(
        DecodeImage,
        fn_constructor_kwargs={"decode_backend": "real"},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
    ).map_batches(
        ResizeImage, fn_constructor_args=(8,), batch_format="pyarrow",
        batch_size=8, concurrency=(1, 2),
    )
    out = ds.to_pandas()
    n_imgs = sum(1 for k in t.column("kind").to_pylist() if k == "image")
    assert len(out) == n_imgs > 0
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    # decoded pixels equal the original synthesized pixels (real codec
    # round-trip through the distributed pipeline)
    raw = synthesize_media(30, seed=11, image_format="raw")
    fake = rd.from_arrow(raw).map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    ).map_batches(
        ResizeImage, fn_constructor_args=(8,), batch_format="pyarrow",
        batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = fake.sort_values("media_id").reset_index(drop=True)
    assert list(a["media_id"]) == list(b["media_id"])
    for pa_, pb in zip(a["pixels"], b["pixels"]):
        np.testing.assert_array_equal(np.asarray(pa_), np.asarray(pb))
