"""Multimodal stage plumbing: schemas, determinism, actor-pool
execution over binary payload columns (decode is the documented stub)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.multimodal import (
    AudioFeatures,
    DecodeImage,
    SampleFrames,
    image_pipeline,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(ray_session):
    return synthesize_media(120, seed=9)


def test_synthesize_deterministic(media):
    again = synthesize_media(120, seed=9)
    assert media.equals(again)
    kinds = set(media.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_image_pipeline(media):
    out = image_pipeline(rd.from_arrow(media), target=8).to_pandas()
    n_images = sum(1 for k in media.column("kind").to_pylist() if k == "image")
    assert len(out) == n_images
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    # deterministic: same input -> same resized pixels
    out2 = image_pipeline(rd.from_arrow(media), target=8).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    for pa_, pb in zip(a["pixels"], b["pixels"]):
        assert list(pa_) == list(pb)


def test_audio_features(media):
    out = (
        rd.from_arrow(media)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=32,
                     concurrency=(1, 2))
        .to_pandas()
    )
    n_audio = sum(1 for k in media.column("kind").to_pylist() if k == "audio")
    assert len(out) == n_audio
    assert all(len(f) == 16 for f in out["features"])
    assert all(np.isfinite(np.asarray(f)).all() for f in out["features"])


def test_frame_sampling(media):
    out = (
        rd.from_arrow(media)
        .map_batches(SampleFrames, fn_constructor_args=(2,),
                     batch_format="pyarrow", batch_size=32, concurrency=(1, 2))
        .to_pandas()
    )
    import json

    expected = 0
    for kind, meta in zip(
        media.column("kind").to_pylist(), media.column("meta").to_pylist()
    ):
        if kind == "video":
            expected += len(range(0, json.loads(meta)["n_frames"], 2))
    assert len(out) == expected
    assert (out["frame_idx"] % 2 == 0).all()
    assert all(isinstance(f, bytes) and len(f) == 64 for f in out["frame"])


def test_real_image_backend_rejects_raw_payloads():
    """The real image backend decodes PNG/BMP by magic bytes; bare pixel
    payloads (no container format) are a hard error, not silent junk."""
    dec = DecodeImage(decode_backend="real")
    t = synthesize_media(10, seed=1)  # image_format="raw"
    with pytest.raises(ValueError):
        dec(t)


def test_wav_roundtrip():
    from bm25_benchmarks_ray.functions.audiocodec import decode_wav, encode_wav

    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32767, size=777).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (777, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.randint(-32768, 32767, size=(123, 2)).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(s2, stereo)


def test_real_audio_backend_decodes_wav(ray_session):
    """decode_backend='real' over REAL WAV payloads: features equal the
    fake backend's on the same underlying samples (mono PCM)."""
    import ray.data as rd_

    raw = synthesize_media(40, seed=5)  # audio payload = bare PCM bytes
    wav = synthesize_media(40, seed=5, audio_format="wav")
    out_fake = (
        rd_.from_arrow(raw)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=16,
                     concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    out_real = (
        rd_.from_arrow(wav)
        .map_batches(
            AudioFeatures,
            fn_constructor_kwargs={"decode_backend": "real"},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(out_real) == len(out_fake) > 0
    for fr, ff in zip(out_real["features"], out_fake["features"]):
        assert np.allclose(np.asarray(fr), np.asarray(ff))


def test_real_audio_backend_rejects_raw_payloads():
    feats = AudioFeatures(decode_backend="real")
    t = synthesize_media(10, seed=1)  # audio_format="raw": no RIFF header
    with pytest.raises(Exception):
        feats(t)
