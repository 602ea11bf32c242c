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


def audio_encode(samples: np.ndarray, sr: int) -> bytes:
    """float samples in [-1, 1] → FAUD bytes (inverse of audio_decode)."""
    pcm = np.clip(samples * 32767, -32768, 32767).astype("<i2")
    return _AUD_MAGIC + struct.pack("<II", sr, len(pcm)) + pcm.tobytes()


def perturb_audio(samples: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 'same recording, different master': 0.8x gain +
    1% seeded noise — the perturbation the fingerprint must survive."""
    rng = (mix64(np.arange(len(samples), dtype=np.uint64),
                 np.uint64(seed ^ 0x5A5A)).astype(np.float64)
           / 2**64 - 0.5)
    return np.clip(0.8 * samples + 0.01 * rng, -1.0, 1.0)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit Haitsma-Kalker audio fingerprint ("A Highly Robust Audio
    Fingerprinting System", ISMIR 2002): band the clip into a 9-frame x
    9-band spectral energy grid, then each bit is the sign of the
    energy difference along BOTH time and frequency,
    ``E(t,b)-E(t,b+1) - (E(t+1,b)-E(t+1,b+1)) > 0`` — gain-invariant
    (differences scale with volume) and robust to additive noise
    (measured on the synthetic corpus: twin distance <= 7, distinct
    clips >= 15, so Hamming <= 10 separates cleanly).  8x8 sign matrix
    → one uint64, ready for the simhash/pHash banding machinery."""
    n_frames, n_bands = 9, 9
    frame = len(samples) // n_frames
    # degenerate clips: no full frame, or a single-bin rfft spectrum
    # (frame == 1 gives one bin; every linspace band edge floors to 1
    # and reduceat would index out of bounds)
    if frame == 0 or frame // 2 + 1 < 2:
        return 0
    m = samples[:n_frames * frame].reshape(n_frames, frame)
    spec = np.abs(np.fft.rfft(m, axis=1)) ** 2
    edges = np.linspace(1, spec.shape[1], n_bands + 1).astype(int)
    e = np.add.reduceat(spec, edges[:-1], axis=1)
    d = e[:, :-1] - e[:, 1:]
    bits = ((d[:-1] - d[1:]) > 0).ravel()
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return int((weights[: len(bits)] * bits.astype(np.uint64)).sum())


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


def video_encode(frames: np.ndarray) -> bytes:
    """(n_frames, h, w) uint8 → FVID bytes (inverse of video_decode)."""
    n, h, w = frames.shape
    return (_VID_MAGIC + struct.pack("<HHH", w, h, n)
            + frames.astype(np.uint8).tobytes())


def perturb_video(frames: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 'same clip, different encode': +8 brightness and
    seeded per-pixel noise in [-3, 3] — what the temporal fingerprint
    must survive."""
    idx = np.arange(frames.size, dtype=np.uint64)
    noise = ((mix64(idx, np.uint64(seed ^ 0xC0FFEE)) % np.uint64(7))
             .astype(np.int16) - 3).reshape(frames.shape)
    return np.clip(frames.astype(np.int16) + 8 + noise,
                   0, 255).astype(np.uint8)


def video_fingerprint64(frames: np.ndarray) -> int:
    """64-bit temporal-spatial video fingerprint: mean intensity over a
    9-temporal-segment x 3x3-spatial-cell grid, bits = sign of the
    double difference along space and time (the Haitsma-Kalker
    construction transplanted to pixels) — brightness-offset-invariant
    (differences cancel a constant shift) and robust to per-pixel
    noise via the ~90-pixel cell averages (measured on the synthetic
    corpus: twin distance <= 3, distinct clips >= 18).  All reduceat,
    no Python per cell."""
    n, h, w = frames.shape
    if n < 9 or h < 3 or w < 3:
        return 0
    tseg = np.linspace(0, n, 10).astype(int)
    seg = (np.add.reduceat(frames.astype(np.float64), tseg[:-1], axis=0)
           / np.diff(tseg)[:, None, None])
    ys = np.linspace(0, h, 4).astype(int)
    xs = np.linspace(0, w, 4).astype(int)
    cell = np.add.reduceat(np.add.reduceat(seg, ys[:-1], axis=1),
                           xs[:-1], axis=2)
    e = (cell / np.outer(np.diff(ys), np.diff(xs))).reshape(9, 9)
    d = e[:, :-1] - e[:, 1:]
    bits = ((d[:-1] - d[1:]) > 0).ravel()
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return int((weights[: len(bits)] * bits.astype(np.uint64)).sum())
