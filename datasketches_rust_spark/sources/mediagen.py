"""Deterministic synthetic audio/video tables (multimodal fixtures).

Same design as :mod:`imagegen`: content is a pure function of
``(n_rows, seed)``, generation runs executor-side via ``mapInPandas``
(the only shape that materializes a 10^12-row fixture), and the
planted structure is SQL-derivable so a DuckDB oracle can pin it
without reading the binary payloads:

* rows come in PAIRS — row ``2j`` and ``2j+1`` carry byte-identical
  payloads (planted exact duplicates), so every row's fingerprint must
  equal its partner's;
* audio clip ``j`` has exactly ``4096 + (j % 7) * 1024`` frames
  (mono-equivalent samples) at ``1 + (j % 2)`` channels of pcm16;
* video clip ``j`` has exactly ``6 + (j % 5) * 2`` rawrgb frames of
  16x16.

The payloads themselves are seeded noise (+ a sine for audio realism):
what matters for the oracle is the planted dup structure and the
length formulas, both checked from real decoded samples Spark-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SAMPLE_RATE = 16_000
VIDEO_W = VIDEO_H = 16


def audio_frames_for_pair(j: int) -> int:
    """Planted per-pair frame count (the oracle's length formula)."""
    return 4096 + (j % 7) * 1024


def video_frames_for_pair(j: int) -> int:
    """Planted per-pair frame count (the oracle's length formula)."""
    return 6 + (j % 5) * 2


def _audio_pair_payload(j: int, seed: int) -> tuple[bytes, int]:
    """(pcm16 bytes, n_channels) for pair ``j`` — pure function."""
    rng = np.random.default_rng(seed + 7_900_003 * j)
    frames = audio_frames_for_pair(j)
    nch = 1 + (j % 2)
    t = np.arange(frames * nch, dtype=np.float64)
    tone = 8000.0 * np.sin(2 * np.pi * (220.0 + 13.0 * (j % 11)) * t / AUDIO_SAMPLE_RATE)
    noise = rng.integers(-4000, 4001, size=frames * nch)
    pcm = np.clip(tone + noise, -32768, 32767).astype("<i2")
    return pcm.tobytes(), nch


def _video_pair_payload(j: int, seed: int) -> tuple[bytes, int]:
    """(rawrgb bytes, n_frames) for pair ``j`` — pure function."""
    rng = np.random.default_rng(seed + 9_700_009 * j)
    nf = video_frames_for_pair(j)
    base = rng.integers(0, 256, size=(1, VIDEO_H, VIDEO_W, 3), dtype=np.int32)
    drift = rng.integers(-2, 3, size=(nf, VIDEO_H, VIDEO_W, 3), dtype=np.int32)
    frames = (base + drift).clip(0, 255).astype(np.uint8)
    return frames.tobytes(), nf


def _pair_slices(spark: SparkSession, n_pairs: int, partitions: int) -> DataFrame:
    partitions = max(1, min(partitions, n_pairs))
    base, extra = divmod(n_pairs, partitions)
    slices, start = [], 0
    for p in range(partitions):
        cnt = base + (1 if p < extra else 0)
        slices.append((start, cnt))
        start += cnt
    return spark.createDataFrame(
        spark.sparkContext.parallelize(slices, partitions), "start long, cnt int"
    )


def generate_audio_df(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int = 4
) -> DataFrame:
    """(audio_id, bytes, sample_rate, n_channels, fmt) — ``n_rows``
    must be even (rows pair up as planted exact duplicates)."""
    assert n_rows % 2 == 0, "n_rows must be even (planted dup pairs)"

    def gen(batches):
        for pdf in batches:
            for start, cnt in zip(pdf["start"], pdf["cnt"]):
                rows = []
                for j in range(int(start), int(start) + int(cnt)):
                    data, nch = _audio_pair_payload(j, seed)
                    for i in (2 * j, 2 * j + 1):
                        rows.append(
                            {
                                "audio_id": f"aud_{i:08d}",
                                "bytes": data,
                                "sample_rate": AUDIO_SAMPLE_RATE,
                                "n_channels": nch,
                                "fmt": "pcm16",
                            }
                        )
                if rows:
                    yield pd.DataFrame.from_records(rows)

    return _pair_slices(spark, n_rows // 2, partitions).mapInPandas(
        gen, "audio_id string, bytes binary, sample_rate int, n_channels int, fmt string"
    )


def generate_video_df(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int = 4
) -> DataFrame:
    """(video_id, bytes, w, h, n_frames, fmt) — ``n_rows`` must be even
    (rows pair up as planted exact duplicates)."""
    assert n_rows % 2 == 0, "n_rows must be even (planted dup pairs)"

    def gen(batches):
        for pdf in batches:
            for start, cnt in zip(pdf["start"], pdf["cnt"]):
                rows = []
                for j in range(int(start), int(start) + int(cnt)):
                    data, nf = _video_pair_payload(j, seed)
                    for i in (2 * j, 2 * j + 1):
                        rows.append(
                            {
                                "video_id": f"vid_{i:08d}",
                                "bytes": data,
                                "w": VIDEO_W,
                                "h": VIDEO_H,
                                "n_frames": nf,
                                "fmt": "rawrgb",
                            }
                        )
                if rows:
                    yield pd.DataFrame.from_records(rows)

    return _pair_slices(spark, n_rows // 2, partitions).mapInPandas(
        gen, "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
    )
