"""Real media codecs for formats that need NO external libraries.

The container has no PIL/opencv/ffmpeg, so compressed formats stay
honestly gated (operators/multimodal.py raises). But uncompressed
formats are just headers + raster/PCM bytes, which numpy and the stdlib
decode exactly:

- **PNM images** (P5 = 8-bit grayscale PGM, P6 = 8-bit RGB PPM): ASCII
  header, then raw bytes row-major. Decode/encode/resize are pure numpy.
- **WAV audio** (PCM 16-bit): stdlib ``wave`` + ``numpy.frombuffer``.

These run inside the same Arrow-batched ``mapInPandas`` plumbing the
stubs use (operators/multimodal.py), so the multimodal path is REAL
end-to-end for these formats — decode, nearest-neighbor resize,
deterministic feature extraction — and the plumbing-vs-kernel split is
proven by swapping kernels without touching the Spark side.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def _read_pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse magic, width, height, maxval; return them + body offset.
    Tokens are whitespace-separated; '#' comments run to end-of-line."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload (magic {data[:2]!r})")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(data):
            raise ValueError("truncated PNM header")
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
    i += 1  # single whitespace after maxval, then raster bytes
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return data[:2], w, h, maxval, i


def decode_pnm(data: bytes) -> np.ndarray:
    """P5 -> (h, w) uint8; P6 -> (h, w, 3) uint8."""
    magic, w, h, _maxval, off = _read_pnm_header(data)
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return raster.reshape((h, w, 3)) if ch == 3 else raster.reshape((h, w))


def encode_pnm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`decode_pnm` (maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w) or (h,w,3), got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (sample-at-pixel-center
    index mapping — the classic formula, reproducible everywhere)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def image_features(arr: np.ndarray, n: int = 8) -> list[float]:
    """Fixed-size deterministic image descriptor: per-channel means +
    intensity stats + aspect, padded/truncated to ``n`` (floats in
    [0, 1]-ish ranges; exact given exact inputs)."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    chan_means = [float(a[:, :, i].mean()) / 255.0 for i in range(min(c, 3))]
    gray = a.mean(axis=2)
    feats = chan_means + [
        float(gray.std()) / 255.0,
        float(gray.min()) / 255.0,
        float(gray.max()) / 255.0,
        w / max(h, 1),
        float(c),
    ]
    return (feats + [0.0] * n)[:n]


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV -> (sample_rate, samples[frames, channels] int16)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        sr = f.getframerate()
        raw = f.readframes(f.getnframes())
        arr = np.frombuffer(raw, dtype="<i2").reshape(-1, f.getnchannels())
    return sr, arr


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(a.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()


def audio_features(sample_rate: int, samples: np.ndarray, n: int = 8) -> list[float]:
    """Deterministic audio descriptor: duration, RMS, peak, zero-crossing
    rate, DC offset — padded/truncated to ``n``."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    frames = len(mono)
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    feats = [
        frames / float(sample_rate),
        float(np.sqrt(np.mean(mono**2))) if frames else 0.0,
        float(np.abs(mono).max()) if frames else 0.0,
        zc / max(frames - 1, 1),
        float(mono.mean()) if frames else 0.0,
        float(sample_rate),
    ]
    return (feats + [0.0] * n)[:n]


def decode_pnm_stream(data: bytes) -> list[np.ndarray]:
    """Concatenated binary PNM frames (the uncompressed MJPEG-style
    stream: each frame is self-delimiting via its header) -> list of
    frame arrays. The REAL kernel behind multimodal frame sampling for
    payloads no external codec is needed for."""
    frames = []
    off = 0
    while off < len(data):
        chunk = data[off:]
        magic, w, h, _mv, body = _read_pnm_header(chunk)
        ch = 3 if magic == b"P6" else 1
        end = body + w * h * ch
        if end > len(chunk):
            raise ValueError("truncated PNM frame in stream")
        frames.append(decode_pnm(chunk[:end]))
        off += end
    return frames
