"""Multimodal audio/video plumbing (operators/media.py, functions/audio.py):
codec round-trips, feature sanity, Spark batch shape, map-only plans, and
composition of sampled video frames into the image phash path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from csxj_crawler_spark.functions import audio as A
from csxj_crawler_spark.operators import media as M
from csxj_crawler_spark.operators import payload as P

RATE = 8000


def _sine(freq: float, secs: float = 0.5, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(RATE * secs)) / RATE
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# pure-numpy codec + feature units
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(42)
    mono = rng.integers(-32768, 32767, 4000, dtype=np.int16)
    s, r = A.decode_wav(A.encode_wav(mono, RATE))
    assert r == RATE and np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32767, (4000, 2), dtype=np.int16)
    s2, _ = A.decode_wav(A.encode_wav(stereo, RATE))
    assert np.array_equal(s2, stereo)


def test_wav_decoder_walks_extra_chunks():
    """Real WAVs carry LIST/INFO chunks between fmt and data."""
    blob = A.encode_wav(_sine(440), RATE)
    # splice a LIST chunk after the fmt chunk (ends at byte 36)
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = blob[:36] + extra + blob[36:]
    s, r = A.decode_wav(spliced)
    assert r == RATE and len(s) == len(_sine(440))


def test_audio_features_sanity():
    silence = A.audio_features(np.zeros(4096, dtype=np.int16), RATE)
    assert silence["rms"] == 0.0 and silence["peak"] == 0.0
    tone = A.audio_features(_sine(1000, amp=0.5), RATE)
    # sine RMS = amp/sqrt(2); centroid at the tone frequency
    assert abs(tone["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(tone["centroid_hz"] - 1000) < 100
    low = A.audio_features(_sine(200), RATE)
    assert low["centroid_hz"] < tone["centroid_hz"]
    assert low["zcr"] < tone["zcr"]


def test_rawvid_roundtrip():
    rng = np.random.default_rng(42)
    frames = rng.integers(0, 256, (7, 6, 8, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_rawvid(M.encode_rawvid(frames)), frames)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clips(spark):
    rows = [
        ("c_tone", bytes(A.encode_wav(_sine(440), RATE)), RATE, 1, "wav"),
        ("c_silence", bytes(A.encode_wav(np.zeros(4000, np.int16), RATE)), RATE, 1, "wav"),
        ("c_corrupt", b"RIFFjunk", RATE, 1, "wav"),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sample_rate int, n_channels int, fmt string"
    )


def test_extract_audio_features_spark(clips):
    out = {r["clip_id"]: r for r in M.extract_audio_features(clips).collect()}
    assert out["c_tone"]["decode_ok"] and out["c_tone"]["rms"] > 0.3
    assert out["c_silence"]["decode_ok"] and out["c_silence"]["rms"] == 0.0
    assert not out["c_corrupt"]["decode_ok"]  # error row, not an abort


def test_unknown_audio_fmt_raises(spark, clips):
    mp3 = spark.createDataFrame(
        [("x", b"\xff\xfb", RATE, 1, "mp3")], clips.schema
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        M.extract_audio_features(mp3).collect()


@pytest.fixture(scope="module")
def videos(spark):
    rng = np.random.default_rng(42)
    rows = []
    for vid, n in (("v0", 12), ("v1", 3)):
        frames = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)
        rows.append((vid, bytes(M.encode_rawvid(frames)), 16, 16, n, "rawvid"))
    return spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
    )


def test_sample_video_frames(videos):
    out = M.sample_video_frames(videos, every_n=5).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert sorted(by_vid["v0"]) == [0, 5, 10]
    assert sorted(by_vid["v1"]) == [0]
    assert all(len(r["bytes"]) == 16 * 16 * 3 and r["fmt"] == "raw" for r in out)


def test_media_operators_are_map_only(clips, videos):
    """Payload blobs must never ride a shuffle: both plans are exchange-free."""
    for df in (M.extract_audio_features(clips), M.sample_video_frames(videos)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_frames_feed_image_phash_path(videos):
    """Sampled frames (bytes, w, h, fmt='raw') run the image operators
    unchanged: decode+phash, then near-dup pruning over the frames."""
    frames = M.sample_video_frames(videos, every_n=5).select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string")).alias(
            "image_id"
        ),
        "bytes", "fmt", "w", "h",
    )
    hashed = P.decode_and_phash(frames)
    rows = hashed.collect()
    assert len(rows) == 4 and all(r["decode_ok"] for r in rows)
    assert all(r["dec_w"] == 16 and r["dec_h"] == 16 for r in rows)
    # compose into the D6 near-dup pruner (random frames -> nothing pruned)
    with_phash = frames.join(
        hashed.select("image_id", F.col("phash_re").alias("phash")), "image_id"
    )
    kept = P.phash_prune_keep_first(with_phash)
    assert kept.count() == 4
