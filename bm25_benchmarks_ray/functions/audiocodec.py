"""Pure-stdlib WAV (RIFF/PCM) codec — the real audio decode behind
``decode_backend="real"``.

The container has no soundfile/librosa/ffmpeg, but WAV is a stdlib
format (`wave` + numpy): the same make-the-kernel-real move as the PNG
codec (functions/imagecodec.py).  Supports 16-bit PCM, mono or
multi-channel (channels are averaged to mono for feature extraction —
the common ASR preprocessing convention).

Reference scope note: the reference benchmark suite is text-only; this
module serves SURVEY.md's multimodal-extension requirement (audio as an
opaque binary column with typed metadata, decoded in actor-pool
map_batches stages).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 sample array (n,) or (n, channels) → WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(s).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n, channels), sample_rate).

    Only 16-bit PCM is accepted (the format synthesize_media emits and
    the overwhelmingly common case); anything else raises ValueError so
    a bad payload fails loudly instead of producing garbage features."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {w.getsampwidth()}")
        n = w.getnframes()
        ch = w.getnchannels()
        raw = w.readframes(n)
        rate = w.getframerate()
    samples = np.frombuffer(raw, dtype=np.int16).reshape(-1, ch)
    return samples, rate


def wav_to_mono_f64(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples, sample_rate): channel mean."""
    s, rate = decode_wav(payload)
    return s.astype(np.float64).mean(axis=1), rate
