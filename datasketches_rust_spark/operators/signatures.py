"""Spark signature operators: MinHash signatures + LSH band keys as
vectorized pandas UDFs (Arrow-batched; no per-row Python — BASELINE
input_hint requirement).

The UDF computes the signature AND its band keys in one pass so the
shingle hashing (the expensive part) runs once; the result is a struct
column, a pure projection with no shuffle (SURVEY.md §2 Part B,
"shingle hashing → bottom-k signature").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import MinHashConfig, SimHashConfig
from ..functions.minhash import band_hashes, minhash_signatures
from ..functions.simhash import simhash_tokens

# int64 view of the all-ones empty-signature sentinel (uint64 max)
EMPTY_SLOT_I64 = -1


def minhash_signature_col(text_col: str, cfg: MinHashConfig) -> Column:
    """Column expression: struct(signature array<long>, bands array<long>)."""

    @pandas_udf("struct<signature: array<long>, bands: array<long>>")
    def _sig(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in texts:
            sigs = minhash_signatures(batch.tolist(), cfg)
            bands = band_hashes(sigs, cfg)
            sig_i64 = sigs.view(np.int64)
            band_i64 = bands.view(np.int64)
            yield pd.DataFrame(
                {
                    "signature": list(sig_i64),
                    "bands": list(band_i64),
                }
            )

    return _sig(F.col(text_col))


def simhash_col(text_col: str, cfg: SimHashConfig) -> Column:
    """64-bit token SimHash of a text column as LongType."""

    @pandas_udf("long")
    def _sim(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            h = simhash_tokens(batch.tolist(), cfg)
            yield pd.Series(h.view(np.int64))

    return _sim(F.col(text_col))


def jaccard_from_signatures(sig_a: str, sig_b: str) -> Column:
    """Rowwise MinHash Jaccard estimate between two signature columns.

    Expressed with built-in higher-order functions (zip_with +
    aggregate) so it stays JVM-side inside whole-stage codegen — the
    verification filter never leaves the JVM.
    """
    matches = F.aggregate(
        F.zip_with(F.col(sig_a), F.col(sig_b), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches / F.size(F.col(sig_a))


def _resolve_direct_files(parquet_path: str):
    """Resolve (filesystem, file list) for the direct-read path.

    Plain local paths keep the zero-dependency glob fast path (workers
    open plain paths; no filesystem object is shipped). Paths with a
    URI scheme (``file://``, ``s3://``, ``hdfs://``, ``gs://``, ...)
    resolve through ``pyarrow.fs.FileSystem.from_uri``; the resulting
    filesystem handle is returned and pickled into the worker closure
    (pyarrow filesystems pickle by construction), so driver listing
    and worker opens go through the same storage backend — no shared
    POSIX view required.
    """
    import glob as _glob
    import os as _os

    if "://" not in parquet_path:
        files = sorted(
            _glob.glob(_os.path.join(parquet_path, "*.parquet"))
            or _glob.glob(_os.path.join(parquet_path, "part-*"))
        )
        return None, files

    from pyarrow import fs as pafs

    filesystem, base = pafs.FileSystem.from_uri(parquet_path)
    infos = filesystem.get_file_info(pafs.FileSelector(base, recursive=False))
    names = [
        i.path
        for i in infos
        if i.is_file
        and (i.base_name.endswith(".parquet") or i.base_name.startswith("part-"))
        and not i.base_name.startswith(("_", "."))
    ]
    return filesystem, sorted(names)


def _row_group_splits(
    files: list[str], filesystem, default_parallelism: int
) -> list[tuple[str, int, int]]:
    """Plan splits for the direct read: ``(path, rg_lo, rg_hi)``.

    ``rg_lo == -1`` means "whole file, no footer read" — the default
    when there are already enough files to occupy the cluster
    (file count ≥ 2× default parallelism), so the common many-files
    layout pays zero extra driver I/O. Below that, a consolidated
    few-huge-files layout would strand most cores on per-file tasks,
    so each footer is read once driver-side (cheap exactly when there
    are few files) and files split into contiguous row-group ranges
    targeting ~2 tasks per core in total.
    """
    import pyarrow.parquet as pq

    target = max(2 * default_parallelism, 1)
    if len(files) >= target:
        return [(f, -1, -1) for f in files]
    per_file = -(-target // len(files))  # ceil: chunks wanted per file
    splits: list[tuple[str, int, int]] = []
    for f in files:
        source = filesystem.open_input_file(f) if filesystem else f
        n = pq.ParquetFile(source).metadata.num_row_groups
        k = min(max(n, 1), per_file)
        # contiguous ranges, sizes differing by at most one row group
        bounds = [round(i * n / k) for i in range(k + 1)]
        splits.extend(
            (f, lo, hi) for lo, hi in zip(bounds, bounds[1:]) if hi > lo
        )
        if n == 0:
            splits.append((f, 0, 0))  # keep empty files harmless
    return splits


def signatures_direct(
    spark,
    parquet_path: str,
    minhash_cfg: MinHashConfig | None = None,
    simhash_cfg: SimHashConfig | None = None,
    rows_per_batch: int = 2048,
) -> "DataFrame":
    """One-pass signature stage reading parquet file splits DIRECTLY in
    the Python workers (pyarrow), bypassing the JVM for the pixel
    payload.

    Motivation (measured, local[32], 200k rows / 3.1 GB ``bytes``):
    routing binary columns scan→UnsafeRow→Arrow→worker moves every
    image through two serialization hops; even with the tuned reader
    batch size the JVM path did ~460-4600 img/s and *degraded* with
    concurrency, while workers reading their own file splits sustain
    ~15k img/s and scale linearly. At 100 TB this is the difference
    between a day and an hour per pass — the standard production
    pattern for tensor/binary payloads (Petastorm/DALI-style): Spark
    schedules the files, Python reads them column-pruned.

    Output per row: (image_id, phash long, phash_computed long,
    pixel_simhash long, decode_ok boolean, signature array<long>,
    bands array<long>) — everything downstream (LSH, verification,
    CC) needs; the pixels never leave the worker.

    Filesystem contract: a plain local path lists with a driver-side
    glob and workers open plain paths (the sandbox fast path); a URI
    path (``file://``, ``s3://``, ``hdfs://``, ``gs://``) resolves via
    ``pyarrow.fs.FileSystem.from_uri`` and the filesystem handle rides
    the worker closure, so the same code runs against an object store
    with no shared POSIX view (`_resolve_direct_files`).

    Worker memory contract: files are streamed with
    ``ParquetFile.iter_batches`` (``rows_per_batch`` rows per kernel
    batch, one row group resident at a time) instead of a whole-file
    ``read_table`` — peak worker memory is bounded by the writer's row
    group size, not the file size, so 1 GB-file × 32-concurrent-task
    layouts cannot OOM the Python workers. Per-row outputs are
    unchanged by the chunking (every kernel is per-row deterministic;
    equivalence-tested against the JVM-read pipeline).

    Split granularity: one task per file by default; when the file
    count is below 2× default parallelism (a consolidated few-huge-
    files layout, where per-file tasks would idle most of the
    cluster), each file's footer is read once driver-side and the plan
    splits files into contiguous ROW-GROUP ranges instead — the footer
    reads are only paid exactly when there are few files to read.
    """
    mh = minhash_cfg or MinHashConfig()
    sh = simhash_cfg or SimHashConfig()
    filesystem, files = _resolve_direct_files(parquet_path)
    if not files:
        raise ValueError(f"no parquet files under {parquet_path}")
    splits = _row_group_splits(
        files, filesystem, spark.sparkContext.defaultParallelism
    )
    plan = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, len(splits)),
        "path string, rg_lo int, rg_hi int",
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        from ..functions.phash import (
            downscale_batch,
            phash64_i64_batch_from_grays,
            to_gray,
        )
        from ..functions.simhash import simhash_vectors
        from ..sources.png import decode_image

        cols = ["image_id", "bytes", "fmt", "caption", "phash"]
        for pdf in batches:
            for path, rg_lo, rg_hi in zip(pdf["path"], pdf["rg_lo"], pdf["rg_hi"]):
                source = filesystem.open_input_file(path) if filesystem else path
                reader = pq.ParquetFile(source)
                row_groups = (
                    list(range(rg_lo, rg_hi))
                    if rg_lo >= 0
                    else list(range(reader.metadata.num_row_groups))
                )
                if not row_groups:
                    continue
                for tbl in reader.iter_batches(
                    batch_size=rows_per_batch, columns=cols, row_groups=row_groups
                ):
                    if tbl.num_rows == 0:
                        continue
                    ids = tbl["image_id"].to_pylist()
                    fmts = tbl["fmt"].to_pylist()
                    raws = tbl["bytes"].to_pylist()
                    phs = tbl["phash"].to_pylist()
                    captions = tbl["caption"].to_pylist()
                    # decode per image (zlib is inherently per-buffer);
                    # feature downscale + phash run BATCHED over
                    # same-size luma groups (bit-identical to the
                    # per-image path, ~1.4x on the phash step)
                    grays, oks = [], []
                    for data, fmt in zip(raws, fmts):
                        try:
                            grays.append(to_gray(decode_image(data, fmt)))
                            oks.append(True)
                        except Exception:
                            grays.append(None)
                            oks.append(False)
                    n_rows = len(grays)
                    ok_idx = [i for i, g in enumerate(grays) if g is not None]
                    feats = np.zeros((n_rows, 64), dtype=np.float64)
                    phc = np.zeros(n_rows, dtype=np.int64)
                    if ok_idx:
                        ok_grays = [grays[i] for i in ok_idx]
                        feats[ok_idx] = downscale_batch(ok_grays, 8)
                        phc[ok_idx] = phash64_i64_batch_from_grays(ok_grays)
                    sim = (
                        simhash_vectors(feats, sh).view(np.int64)
                        if n_rows
                        else np.zeros(0, dtype=np.int64)
                    )
                    sigs = minhash_signatures(captions, mh)
                    bands = band_hashes(sigs, mh)
                    yield pd.DataFrame(
                        {
                            "image_id": ids,
                            "phash": pd.array(phs, dtype="int64"),
                            "phash_computed": pd.array(phc, dtype="int64"),
                            "pixel_simhash": pd.array(list(sim), dtype="int64"),
                            "decode_ok": oks,
                            "signature": list(sigs.view(np.int64)),
                            "bands": list(bands.view(np.int64)),
                        }
                    )

    schema = (
        "image_id string, phash long, phash_computed long, pixel_simhash long, "
        "decode_ok boolean, signature array<long>, bands array<long>"
    )
    return plan.mapInPandas(compute, schema)
