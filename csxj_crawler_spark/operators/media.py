"""Multimodal payload plumbing: audio decode/feature-extract and video
frame-sampling over opaque ``binary`` columns with typed metadata (task
brief's multimodal bullet, same pattern as the image path in
operators/payload.py).

Table shapes (mirroring the input_hint convention for images):

* audio_clips(clip_id string, bytes binary, sample_rate int, n_channels int,
  fmt string)
* videos(video_id string, bytes binary, w int, h int, n_frames int,
  fmt string)

Everything per-payload runs inside Arrow-batched ``mapInPandas`` — numpy on
decoded buffers, never per-row Python in Spark's row space.  Payload bytes
stay out of every shuffle: both operators are map-only (no exchange in the
plan — asserted in tests/test_media.py), and downstream analytics join on
the narrow id/feature columns.

Codec reality in this container (no ffmpeg/PIL/soundfile — same constraint
as the image codecs): ``wav`` decodes for real (functions/audio.py), and
``rawvid`` — a length-prefixed header + concatenated raw RGB24 frames — is a
real, decodable container so the frame-sampling plumbing (schema, batch
shape, frame explode) is genuinely exercised end-to-end.  Foreign formats
(mp3/mp4/...) raise ``NotImplementedError`` at decode time behind the same
registry, exactly where a library-backed decoder would plug in.

Sampled frames come out in the image path's (bytes, w, h, fmt='raw') shape
on purpose: they feed ``operators/payload.py`` phash/near-dup/feature
operators unchanged (composed in tests).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from csxj_crawler_spark.functions import audio as A

# ---------------------------------------------------------------------------
# rawvid container: magic + (w, h, n_frames) + n_frames * (w*h*3) RGB24
# ---------------------------------------------------------------------------

_RAWVID_MAGIC = b"RVID"


def encode_rawvid(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 → rawvid blob."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    return _RAWVID_MAGIC + struct.pack("<III", w, h, n) + f.tobytes()


def decode_rawvid(data: bytes) -> np.ndarray:
    if data[:4] != _RAWVID_MAGIC:
        raise ValueError("not a rawvid blob")
    w, h, n = struct.unpack("<III", data[4:16])
    return np.frombuffer(data, dtype=np.uint8, offset=16, count=n * h * w * 3).reshape(
        n, h, w, 3
    )


VIDEO_DECODERS = {"rawvid": decode_rawvid}

# ---------------------------------------------------------------------------
# audio: decode + features
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "clip_id string, decode_ok boolean, duration_s double, rms double, "
    "peak double, zcr double, centroid_hz double"
)


def extract_audio_features(clips: DataFrame, frame: int = 1024) -> DataFrame:
    """Decode + frame-level descriptors per clip, one Arrow batch at a time.

    A clip whose ``fmt`` has no decoder here raises ``NotImplementedError``
    (the library-backed plug-in point); corrupt payloads of a KNOWN format
    yield ``decode_ok=false`` rows instead of failing the job (error rows,
    not aborts — same policy as the crawl fetch path)."""

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                if r.fmt not in A.AUDIO_DECODERS:
                    raise NotImplementedError(
                        f"no decoder for audio fmt={r.fmt!r} in this environment"
                    )
                try:
                    samples, rate = A.AUDIO_DECODERS[r.fmt](bytes(r.bytes))
                    feats = A.audio_features(samples, rate, frame=frame)
                    rows.append((r.clip_id, True, *feats.values()))
                except (ValueError, struct.error, NotImplementedError):
                    # NotImplementedError here is a KNOWN container with an
                    # unsupported encoding (IEEE-float / 24-bit / a-law WAV —
                    # common in the wild): per the error-row policy that is a
                    # decode_ok=false row, not a job abort.  The registry-miss
                    # raise above (unknown fmt entirely) stays fatal — that is
                    # the plug-in point, not a data condition.
                    rows.append((r.clip_id, False, 0.0, 0.0, 0.0, 0.0, 0.0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "decode_ok", "duration_s", "rms", "peak",
                    "zcr", "centroid_hz",
                ],
            )

    return clips.select("clip_id", "bytes", "fmt").mapInPandas(
        _extract, AUDIO_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# video: frame sampling
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "video_id string, frame_idx int, bytes binary, w int, h int, fmt string"


def sample_video_frames(videos: DataFrame, every_n: int = 5) -> DataFrame:
    """Every ``every_n``-th frame of each video, emitted in the image path's
    (bytes, w, h, fmt='raw') shape so phash/near-dup/feature operators apply
    unchanged.

    Map-only: each video's blob is decoded once inside its Arrow batch and
    the sampled frames are emitted as new rows — the blob itself never
    enters a shuffle."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                if r.fmt not in VIDEO_DECODERS:
                    raise NotImplementedError(
                        f"no decoder for video fmt={r.fmt!r} in this environment"
                    )
                try:
                    frames = VIDEO_DECODERS[r.fmt](bytes(r.bytes))
                except (ValueError, struct.error):
                    # truncated / corrupt blob of a KNOWN format: error row
                    # (frame_idx=-1, fmt='error', no bytes), same policy as
                    # the audio path — one bad payload must not abort the job
                    rows.append((r.video_id, -1, None, 0, 0, "error"))
                    continue
                n, h, w, _ = frames.shape
                for idx in range(0, n, every_n):
                    rows.append(
                        (r.video_id, idx, frames[idx].tobytes(), w, h, "raw")
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "bytes", "w", "h", "fmt"]
            )

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        _sample, FRAME_SCHEMA
    )
