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
from ..functions.phash import to_gray
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
        from ..functions.phash import downscale_batch, phash64_i64_batch_from_grays

        for pdf in batches:
            # decode per image; downscale + phash batched over
            # same-size luma groups (bit-identical, see
            # functions/phash.py::phash64_i64_batch_from_grays)
            ids, grays, lumas, oks = [], [], [], []
            for _id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                ids.append(_id)
                try:
                    gray = to_gray(decode_image(bytes(data), fmt))
                    grays.append(gray)
                    lumas.append(float(gray.mean()))
                    oks.append(True)
                except Exception:
                    grays.append(None)
                    lumas.append(0.0)
                    oks.append(False)
            n_rows = len(grays)
            ok_idx = [i for i, g in enumerate(grays) if g is not None]
            feats = np.zeros((n_rows, 64), dtype=np.float64)
            phashes = np.zeros(n_rows, dtype=np.int64)
            if ok_idx:
                ok_grays = [grays[i] for i in ok_idx]
                feats[ok_idx] = downscale_batch(ok_grays, 8)
                phashes[ok_idx] = phash64_i64_batch_from_grays(ok_grays)
            sim = simhash_vectors(feats, cfg).view(np.int64) if n_rows else []
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


def resize_images(
    df: DataFrame, out_w: int, out_h: int, method: str = "area"
) -> DataFrame:
    """Decode → resize → re-encode each image to (out_w, out_h) — the
    standard normalization step before batching images into a training
    pipeline. ``method``: 'area' (box average via 2-D bucket means —
    the right filter for downscaling) or 'nearest' (index mapping,
    exact for upscales of flat regions). Pure NumPy per buffer inside
    ``mapInPandas`` (the unavoidable per-buffer decode; everything
    around it is vectorized), corrupt buffers pass through with
    ``resize_ok = false`` instead of failing the task.

    Returns (image_id, bytes, w int, h int, fmt, resize_ok boolean) —
    the same input_hint schema shape, so the output composes with
    every downstream image operator.
    """
    if method not in ("area", "nearest"):
        raise ValueError(f"unknown resize method {method}")

    def _resize(img: "np.ndarray") -> "np.ndarray":
        h, w = img.shape[:2]
        if method == "nearest" or out_w > w or out_h > h:
            yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
            xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
            return img[yi[:, None], xi[None, :]]
        # area/box filter: mean over the source box of each output cell
        ys = (np.arange(out_h + 1) * h // out_h)
        xs = (np.arange(out_w + 1) * w // out_w)
        acc = np.zeros((out_h, out_w, img.shape[2]), np.float64)
        for oy in range(out_h):
            rows = img[ys[oy] : max(ys[oy + 1], ys[oy] + 1)]
            # mean over y first, then bucket-mean over x via reduceat
            rmean = rows.mean(axis=0)
            sums = np.add.reduceat(rmean, xs[:-1], axis=0)
            counts = np.maximum(np.diff(xs), 1)[:, None]
            acc[oy] = sums / counts
        return np.clip(np.round(acc), 0, 255).astype(np.uint8)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.png import decode_image, encode_image

        for pdf in batches:
            out_bytes, oks, ws, hs = [], [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    img = decode_image(bytes(data), fmt)
                    out_bytes.append(encode_image(_resize(img), fmt))
                    oks.append(True)
                    ws.append(out_w)
                    hs.append(out_h)
                except Exception:
                    # pass the original buffer through but DON'T claim
                    # the target dimensions for it — a consumer trusting
                    # (w, h) would misinterpret the un-resized payload
                    out_bytes.append(bytes(data))
                    oks.append(False)
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": out_bytes,
                    "w": pd.array(ws, dtype="Int32"),
                    "h": pd.array(hs, dtype="Int32"),
                    "fmt": pdf["fmt"],
                    "resize_ok": oks,
                }
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        compute, "image_id string, bytes binary, w int, h int, fmt string, resize_ok boolean"
    )
