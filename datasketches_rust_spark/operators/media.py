"""Audio/video payload operators — multimodal columns beyond images.

Same design as operators/images.py: the payload is an opaque
``binary`` column with typed metadata; all per-buffer work runs in
``mapInPandas`` over Arrow batches; corrupt or unsupported rows yield
``decode_ok = false`` instead of killing the task (at 10^12 rows a
task-killing row is an outage).

Codec status (this container has no media libraries):

* ``pcm16`` audio and ``rawrgb`` video are REAL deterministic decoders
  (numpy reinterpretation) — they exercise the full Spark plumbing:
  schema, partitioning, UDF signature, Arrow batch shape.
* compressed formats (``mp3``/``opus``/``h264``/…) are STUBS behind a
  clearly-marked ``NotImplementedError`` — swap ``decode_audio`` /
  ``iter_frames`` for a libsndfile/pyav-backed implementation to
  enable them; nothing else changes.

Feature extraction is real numpy: audio → per-frame RMS + zero-crossing
rate + rFFT band energies → 64-bit SimHash; video → frame sampling →
per-frame perceptual hash → majority-bit video fingerprint.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import SimHashConfig
from ..functions.phash import phash64_i64
from ..functions.simhash import simhash_vectors

AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int, n_channels int, fmt string"
VIDEO_SCHEMA = "video_id string, bytes binary, w int, h int, n_frames int, fmt string"


def decode_audio(data: bytes, fmt: str, n_channels: int) -> np.ndarray:
    """PCM float64 mono samples in [-1, 1]. REAL for ``pcm16``;
    compressed codecs are stubbed (module docstring)."""
    if fmt == "pcm16":
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        if n_channels > 1:
            pcm = pcm[: len(pcm) - len(pcm) % n_channels]
            pcm = pcm.reshape(-1, n_channels).mean(axis=1)
        return pcm
    raise NotImplementedError(
        f"audio codec {fmt!r} requires an external decoder (libsndfile/pyav); "
        "only pcm16 is built in"
    )


def iter_frames(data: bytes, fmt: str, w: int, h: int, n_frames: int) -> np.ndarray:
    """(n_frames, h, w, 3) uint8 frames. REAL for ``rawrgb``;
    compressed codecs are stubbed (module docstring)."""
    if fmt == "rawrgb":
        want = n_frames * h * w * 3
        if len(data) < want:
            raise ValueError(f"rawrgb buffer too short: {len(data)} < {want}")
        return np.frombuffer(data[:want], dtype=np.uint8).reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"video codec {fmt!r} requires an external decoder (pyav/ffmpeg); "
        "only rawrgb is built in"
    )


def audio_features(
    df: DataFrame,
    cfg: SimHashConfig | None = None,
    frame_len: int = 1024,
    n_bands: int = 32,
) -> DataFrame:
    """Per-clip features: duration, RMS, zero-crossing rate, rFFT band
    energies → 64-bit SimHash fingerprint.

    Returns (audio_id, n_samples long, rms double, zcr double,
    audio_simhash long, decode_ok boolean).
    """
    cfg = cfg or SimHashConfig()

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rmss, zcrs, feats, oks = [], [], [], [], [], []
            for _id, data, sr, nch, fmt in zip(
                pdf["audio_id"], pdf["bytes"], pdf["sample_rate"],
                pdf["n_channels"], pdf["fmt"],
            ):
                ids.append(_id)
                try:
                    pcm = decode_audio(bytes(data), fmt, int(nch))
                    if not len(pcm):
                        raise ValueError("empty clip")
                    ns.append(len(pcm))
                    rmss.append(float(np.sqrt(np.mean(pcm**2))))
                    # guard len<2: diff of a 1-sample clip is empty and
                    # its mean would be NaN
                    zcrs.append(
                        float(np.mean(np.abs(np.diff(np.signbit(pcm)))))
                        if len(pcm) >= 2
                        else 0.0
                    )
                    # clips shorter than one frame zero-pad to a single
                    # frame: a (0, frame_len) reshape would mean() over
                    # zero rows into an all-NaN spectrum, collapsing
                    # every short clip onto one garbage fingerprint
                    # with decode_ok=True
                    if len(pcm) < frame_len:
                        pcm = np.pad(pcm, (0, frame_len - len(pcm)))
                    n = len(pcm) - len(pcm) % frame_len
                    spec = np.abs(
                        np.fft.rfft(pcm[:n].reshape(-1, frame_len), axis=1)
                    ).mean(axis=0)
                    band = spec[: n_bands * (len(spec) // n_bands)].reshape(n_bands, -1).mean(axis=1)
                    feats.append(np.log1p(band))
                    oks.append(True)
                except Exception:
                    ns.append(0); rmss.append(0.0); zcrs.append(0.0)
                    feats.append(np.zeros(n_bands)); oks.append(False)
            sim = simhash_vectors(np.stack(feats), cfg).view(np.int64) if feats else []
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "n_samples": pd.array(ns, dtype="int64"),
                    "rms": rmss,
                    "zcr": zcrs,
                    "audio_simhash": pd.array(list(sim), dtype="int64"),
                    "decode_ok": oks,
                }
            )

    return df.select("audio_id", "bytes", "sample_rate", "n_channels", "fmt").mapInPandas(
        compute,
        "audio_id string, n_samples long, rms double, zcr double, "
        "audio_simhash long, decode_ok boolean",
    )


def video_fingerprints(df: DataFrame, sample_every: int = 2) -> DataFrame:
    """Frame-sample each clip (every ``sample_every``-th frame), phash
    each sampled frame, and majority-vote the bits into one 64-bit
    video fingerprint (near-dup clips agree frame-wise → small Hamming
    distance; reuses the phash Hamming-LSH pair path downstream).

    Returns (video_id, n_sampled int, video_phash long, first_frame_phash
    long, decode_ok boolean).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, counts, vps, fps, oks = [], [], [], [], []
            for _id, data, w, h, nf, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fmt"],
            ):
                ids.append(_id)
                try:
                    frames = iter_frames(bytes(data), fmt, int(w), int(h), int(nf))
                    sampled = frames[::sample_every]
                    phs_i64 = np.array(
                        [phash64_i64(fr) for fr in sampled], dtype=np.int64
                    )
                    phs = phs_i64.view(np.uint64)
                    bits = ((phs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
                    maj = (bits.sum(axis=0) * 2 > len(phs)).astype(np.uint64)
                    vp = (maj << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
                    counts.append(len(sampled))
                    vps.append(int(np.uint64(vp).astype(np.int64)))
                    fps.append(int(phs_i64[0]) if len(phs_i64) else 0)
                    oks.append(True)
                except Exception:
                    counts.append(0); vps.append(0); fps.append(0); oks.append(False)
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "n_sampled": pd.array(counts, dtype="int32"),
                    "video_phash": pd.array(vps, dtype="int64"),
                    "first_frame_phash": pd.array(fps, dtype="int64"),
                    "decode_ok": oks,
                }
            )

    return df.select("video_id", "bytes", "w", "h", "n_frames", "fmt").mapInPandas(
        compute,
        "video_id string, n_sampled int, video_phash long, "
        "first_frame_phash long, decode_ok boolean",
    )
