"""Synthetic audio/video codecs + feature kernels for the multimodal
pipeline stages (BASELINE brief: treat media as opaque binary columns;
decode / feature-extract / frame-sample as actor-pool map_batches
stages).

The container has no real media libraries, so the CODECS here are
deterministic sandbox stand-ins (documented formats, seeded content,
exact round-trip) — the Ray-side plumbing (schema, batch size, stage
signatures, output layout) is the real, tested part; swapping
ffmpeg/soundfile in changes only the two ``*_decode`` functions.

Formats:
- ``faud``: header ``FAUD | sr(u32) | n(u32)`` + int16 little-endian
  PCM mono samples.
- ``fvid``: header ``FVID | w(u16) | h(u16) | n_frames(u16)`` +
  n_frames raw uint8 grayscale frames (w*h bytes each).
"""

from __future__ import annotations

import struct

import numpy as np

from .synthweb import mix64

_AUD_MAGIC = b"FAUD"
_VID_MAGIC = b"FVID"


# -- audio ------------------------------------------------------------------

def synth_audio(seed: int, sr: int = 8000, seconds: float = 1.0) -> bytes:
    """Deterministic test tone: two seeded sine components + noise."""
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64) / sr
    f1 = 100 + float(mix64(seed, 1) % np.uint64(400))
    f2 = 500 + float(mix64(seed, 2) % np.uint64(1500))
    rng = (mix64(np.arange(n, dtype=np.uint64), np.uint64(seed))
           .astype(np.float64) / 2**64 - 0.5)
    wave = (0.6 * np.sin(2 * np.pi * f1 * t)
            + 0.3 * np.sin(2 * np.pi * f2 * t) + 0.1 * rng)
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    return _AUD_MAGIC + struct.pack("<II", sr, n) + pcm.tobytes()


def audio_decode(data: bytes) -> tuple[int, np.ndarray]:
    """bytes → (sample_rate, float64 samples in [-1, 1])."""
    if data[:4] != _AUD_MAGIC:
        raise ValueError("not a FAUD payload")
    sr, n = struct.unpack("<II", data[4:12])
    pcm = np.frombuffer(data, dtype="<i2", offset=12, count=n)
    return sr, pcm.astype(np.float64) / 32767.0


def audio_features(samples: np.ndarray, sr: int,
                   frame_ms: int = 25) -> dict:
    """Cheap per-clip features: RMS, zero-crossing rate, peak |amp|,
    per-frame RMS sketch (what a filtering pipeline thresholds on)."""
    n = len(samples)
    rms = float(np.sqrt(np.mean(samples ** 2))) if n else 0.0
    zc = int(np.count_nonzero(np.diff(np.signbit(samples)))) if n > 1 else 0
    frame = max(1, int(sr * frame_ms / 1000))
    n_frames = n // frame
    frames = samples[:n_frames * frame].reshape(n_frames, frame)
    frame_rms = np.sqrt((frames ** 2).mean(axis=1)) if n_frames else \
        np.zeros(0)
    return {"n_samples": n, "sr": sr, "rms_milli": int(round(rms * 1000)),
            "zero_crossings": zc,
            "peak_milli": int(round(float(np.abs(samples).max()
                                          if n else 0.0) * 1000)),
            "n_frames": int(n_frames),
            "frame_rms_mean_milli": int(round(float(frame_rms.mean())
                                              * 1000)) if n_frames else 0}


# -- video ------------------------------------------------------------------

def synth_video(seed: int, w: int = 32, h: int = 24,
                n_frames: int = 16) -> bytes:
    """Deterministic moving-gradient clip."""
    ys = np.arange(h, dtype=np.uint64)[:, None]
    xs = np.arange(w, dtype=np.uint64)[None, :]
    frames = []
    for f in range(n_frames):
        px = mix64(ys * np.uint64(w) + xs,
                   np.uint64(seed) * np.uint64(1000) + np.uint64(f)) \
            % np.uint64(256)
        frames.append(px.astype(np.uint8))
    body = b"".join(fr.tobytes() for fr in frames)
    return _VID_MAGIC + struct.pack("<HHH", w, h, n_frames) + body


def video_decode(data: bytes) -> np.ndarray:
    """bytes → (n_frames, h, w) uint8 grayscale array."""
    if data[:4] != _VID_MAGIC:
        raise ValueError("not a FVID payload")
    w, h, n = struct.unpack("<HHH", data[4:10])
    px = np.frombuffer(data, dtype=np.uint8, offset=10,
                       count=w * h * n)
    return px.reshape(n, h, w)


def sample_frames(frames: np.ndarray, every: int = 4) -> np.ndarray:
    """Frame sampling: every k-th frame, always including frame 0."""
    return frames[::every]
