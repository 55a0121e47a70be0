"""Image-column operators: decode, perceptual features, invariants.

The image payload is an opaque ``binary`` column with typed metadata
(input_hint schema: image_id, bytes, w, h, fmt, caption, phash). All
pixel work runs in ``mapInPandas`` over Arrow batches: the decode per
row is unavoidable (codecs are per-buffer), but everything after the
decode (grayscale, downscale, DCT, hashing) is NumPy.

The codec is the engine's own deterministic PNG/lossy codec
(sources/png.py) because this container has no image libraries; the
Spark-side plumbing — schema, batch shape, UDF signature, partition
behavior — is exactly what a PIL/libjpeg-backed codec would use
(swap ``decode_image`` to change codecs).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import SimHashConfig
from ..functions.phash import downscale, phash64_i64, to_gray
from ..functions.simhash import simhash_vectors
from ..sources.png import decode_image, psnr


def image_features(df: DataFrame, cfg: SimHashConfig | None = None) -> DataFrame:
    """Decode each image and compute perceptual features.

    Returns (image_id, phash_computed long, pixel_simhash long,
    mean_luma double, decode_ok boolean). Corrupt buffers yield
    decode_ok = false instead of failing the job (at 10^12 rows some
    rows WILL be corrupt; a task-killing row is an outage).
    """
    cfg = cfg or SimHashConfig()
    cols = ["image_id", "bytes", "fmt"]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, phashes, simhashes, lumas, oks = [], [], [], [], []
            feats = []
            for _id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                ids.append(_id)
                try:
                    img = decode_image(bytes(data), fmt)
                    gray = to_gray(img)
                    small8 = downscale(gray, 8).reshape(-1)
                    phashes.append(phash64_i64(img))
                    feats.append(small8)
                    lumas.append(float(gray.mean()))
                    oks.append(True)
                except Exception:
                    phashes.append(0)
                    feats.append(np.zeros(64))
                    lumas.append(0.0)
                    oks.append(False)
            sim = simhash_vectors(np.stack(feats), cfg).view(np.int64) if feats else []
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "phash_computed": pd.array(phashes, dtype="int64"),
                    "pixel_simhash": pd.array(list(sim), dtype="int64"),
                    "mean_luma": lumas,
                    "decode_ok": oks,
                }
            )

    schema = (
        "image_id string, phash_computed long, pixel_simhash long, "
        "mean_luma double, decode_ok boolean"
    )
    return df.select(*cols).mapInPandas(compute, schema)


def roundtrip_invariants(df: DataFrame) -> DataFrame:
    """Per-row invariant check after a materialization round-trip
    (BASELINE input_hint): decoded-pixel PSNR vs the stored buffer
    re-encoded/re-decoded, and caption equality is trivially the
    column itself — returns (image_id, psnr_db double, decode_ok).

    For the lossless path psnr_db is +inf (stored as 999.0); lossy
    rows must stay >= 40 dB.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.png import encode_image

        for pdf in batches:
            ids, psnrs, oks = [], [], []
            for _id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                ids.append(_id)
                try:
                    img = decode_image(bytes(data), fmt)
                    rt = decode_image(encode_image(img, fmt), fmt)
                    p = psnr(img, rt)
                    psnrs.append(999.0 if np.isinf(p) else float(p))
                    oks.append(True)
                except Exception:
                    psnrs.append(0.0)
                    oks.append(False)
            yield pd.DataFrame({"image_id": ids, "psnr_db": psnrs, "decode_ok": oks})

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        compute, "image_id string, psnr_db double, decode_ok boolean"
    )
