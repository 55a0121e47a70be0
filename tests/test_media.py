"""Audio/video payload operators: real plumbing, stubbed codecs
(operators/media.py). Deterministic synthetic PCM/raw-RGB fixtures."""

import numpy as np
import pytest

from datasketches_rust_spark.functions.simhash import hamming_distance
from datasketches_rust_spark.operators.media import (
    audio_features,
    decode_audio,
    iter_frames,
    video_fingerprints,
)


def _pcm_clip(freq: float, n: int = 8192, sr: int = 16000, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(n)
    return (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()


def _raw_video(seed: int, n_frames: int = 8, w: int = 32, h: int = 32) -> bytes:
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    frame = np.repeat(np.repeat(coarse, h // 8, axis=0), w // 8, axis=1)
    frames = np.stack([np.clip(frame.astype(np.int32) + f, 0, 255) for f in range(n_frames)])
    return frames.astype(np.uint8).tobytes()


def test_decode_audio_pcm16_real_and_stub():
    pcm = decode_audio(_pcm_clip(440.0), "pcm16", 1)
    assert len(pcm) == 8192 and abs(float(np.abs(pcm).max()) - 0.51) < 0.1
    # stereo downmix halves the sample count
    assert len(decode_audio(_pcm_clip(440.0), "pcm16", 2)) == 4096
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 64, "mp3", 1)


def test_iter_frames_rawrgb_real_and_stub():
    frames = iter_frames(_raw_video(1), "rawrgb", 32, 32, 8)
    assert frames.shape == (8, 32, 32, 3)
    with pytest.raises(NotImplementedError):
        iter_frames(b"\x00" * 64, "h264", 32, 32, 8)


def test_audio_features_spark(spark):
    rows = [
        ("a_440", _pcm_clip(440.0), 16000, 1, "pcm16"),
        ("a_441", _pcm_clip(441.0, seed=1), 16000, 1, "pcm16"),
        ("a_2000", _pcm_clip(2000.0), 16000, 1, "pcm16"),
        ("a_bad", b"\x00" * 128, 16000, 1, "opus"),  # stubbed codec
    ]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int, n_channels int, fmt string"
    )
    out = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert out["a_bad"]["decode_ok"] is False  # unsupported codec ≠ job failure
    assert out["a_440"]["decode_ok"] and out["a_440"]["n_samples"] == 8192
    # near-identical tones fingerprint closer than distant tones
    h440 = np.array([out["a_440"]["audio_simhash"]], np.int64)
    h441 = np.array([out["a_441"]["audio_simhash"]], np.int64)
    h2k = np.array([out["a_2000"]["audio_simhash"]], np.int64)
    assert hamming_distance(h440, h441)[0] < hamming_distance(h440, h2k)[0]
    # higher frequency → higher zero-crossing rate
    assert out["a_2000"]["zcr"] > out["a_440"]["zcr"]


def test_video_fingerprints_spark(spark):
    rows = [
        ("v_1", _raw_video(7), 32, 32, 8, "rawrgb"),
        ("v_1b", _raw_video(7), 32, 32, 8, "rawrgb"),  # identical content
        ("v_2", _raw_video(99), 32, 32, 8, "rawrgb"),
        ("v_bad", b"\x00" * 64, 32, 32, 8, "h264"),  # stubbed codec
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
    )
    out = {r["video_id"]: r for r in video_fingerprints(df).collect()}
    assert out["v_bad"]["decode_ok"] is False
    assert out["v_1"]["n_sampled"] == 4  # every 2nd of 8 frames
    assert out["v_1"]["video_phash"] == out["v_1b"]["video_phash"]
    a = np.array([out["v_1"]["video_phash"]], np.int64)
    b = np.array([out["v_2"]["video_phash"]], np.int64)
    assert hamming_distance(a, b)[0] > 3  # unrelated clips differ
