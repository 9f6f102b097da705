"""Audio payload codec + features — pure numpy (no audio libs in this
container, same constraint as functions/images.py).

* ``wav`` — RIFF/WAVE PCM16, the classic uncompressed container: encoder
  writes the canonical 44-byte header + interleaved little-endian int16
  samples; decoder walks RIFF chunks (tolerating extra chunks like LIST)
  and reshapes with ``np.frombuffer`` — fully real, round-trip bit-exact.
* features — frame-level RMS energy, zero-crossing rate and spectral
  centroid, all whole-clip vectorized (reshape into frames + ``rfft``);
  the standard cheap descriptors a training-data pipeline filters on
  (silence/clipping detection, bandwidth sanity).

Lossy formats (mp3/opus/aac) are format-pluggable via ``AUDIO_DECODERS``
but undecodable here — they raise ``NotImplementedError`` at decode time,
exactly like jpeg on the image path.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 WAV from an (n, channels) or (n,) int16 array."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    byte_rate = rate * ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples (n, channels) int16, sample_rate) from a PCM16 WAV blob.

    Walks RIFF chunks, so blobs with extra metadata chunks still decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    i = 12
    rate = ch = bits = None
    raw = None
    while i + 8 <= len(data):
        typ = data[i : i + 4]
        (length,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + length]
        if typ == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif typ == b"data":
            raw = body
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(raw, dtype="<i2")
    return s.reshape(-1, ch), int(rate)


def _frames(mono: np.ndarray, frame: int) -> np.ndarray:
    """(n_frames, frame) view of a mono float array, tail dropped."""
    n = (len(mono) // frame) * frame
    if n == 0:
        return np.zeros((0, frame), dtype=np.float64)
    return mono[:n].reshape(-1, frame)


def audio_features(
    samples: np.ndarray, rate: int, frame: int = 1024
) -> dict[str, float]:
    """Whole-clip descriptors from framed vectorized math.

    * ``duration_s`` — samples / rate.
    * ``rms`` — root-mean-square of the full-scale-normalized mono mix.
    * ``peak`` — max |amplitude| (1.0 == full scale; clipping detector).
    * ``zcr`` — mean per-frame zero-crossing rate (0..1).
    * ``centroid_hz`` — mean per-frame spectral centroid (rfft magnitudes).
    """
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    s = s / 32768.0
    out = {
        "duration_s": round(len(s) / rate, 6),
        "rms": round(float(np.sqrt(np.mean(s**2))) if len(s) else 0.0, 6),
        "peak": round(float(np.max(np.abs(s))) if len(s) else 0.0, 6),
    }
    fr = _frames(s, frame)
    if len(fr) == 0:
        out["zcr"] = 0.0
        out["centroid_hz"] = 0.0
        return out
    zc = np.mean(np.abs(np.diff(np.signbit(fr), axis=1)), axis=1)
    out["zcr"] = round(float(np.mean(zc)), 6)
    mag = np.abs(np.fft.rfft(fr, axis=1))
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    denom = mag.sum(axis=1)
    denom[denom == 0.0] = 1.0
    cent = (mag * freqs[None, :]).sum(axis=1) / denom
    out["centroid_hz"] = round(float(np.mean(cent)), 6)
    return out


AUDIO_DECODERS = {"wav": decode_wav}
