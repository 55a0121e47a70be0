"""F1-fixture pipeline tests: recall ≥ 0.99 vs planted truth, row
invariants (PSNR ≥ 40 dB, caption equality), image feature parity.
"""

import numpy as np
import pandas as pd
import pytest

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.sources.imagegen import (
    generate_image_caption_table,
    pair_recall,
)
from datasketches_rust_spark.sources.png import decode_image


@pytest.fixture(scope="module")
def table():
    return generate_image_caption_table(300, seed=42)


@pytest.fixture(scope="module")
def spark_table(spark, table, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("imgtab") / "images.parquet")
    df = spark.createDataFrame(table.rows)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_generator_deterministic(table):
    again = generate_image_caption_table(300, seed=42)
    pd.testing.assert_frame_equal(table.rows, again.rows)
    pd.testing.assert_frame_equal(table.truth, again.truth)


def test_roundtrip_invariants(spark_table, table):
    # caption equality + decoded pixels identical after parquet round-trip
    back = spark_table.orderBy("image_id").toPandas()
    orig = table.rows.sort_values("image_id").reset_index(drop=True)
    assert (back["caption"] == orig["caption"]).all()
    for i in range(0, len(orig), 37):
        a = decode_image(bytes(orig["bytes"][i]), orig["fmt"][i])
        b = decode_image(bytes(back["bytes"][i]), back["fmt"][i])
        assert (a == b).all()


def test_psnr_invariant_spark(spark_table):
    from datasketches_rust_spark.operators.images import roundtrip_invariants

    inv = roundtrip_invariants(spark_table).toPandas()
    assert inv["decode_ok"].all()
    assert (inv["psnr_db"] >= 40.0).all()


def test_image_features_match_stored_phash(spark_table, table):
    from datasketches_rust_spark.operators.images import image_features

    feats = image_features(spark_table).toPandas().sort_values("image_id")
    orig = table.rows.sort_values("image_id")
    assert feats["decode_ok"].all()
    assert (
        feats["phash_computed"].to_numpy() == orig["phash"].to_numpy()
    ).all(), "distributed phash must equal generator phash"


def test_corrupt_image_does_not_kill_job(spark, table):
    from datasketches_rust_spark.operators.images import image_features

    rows = table.rows.head(5).copy()
    rows.loc[2, "bytes"] = b"not an image"
    df = spark.createDataFrame(rows)
    feats = image_features(df).toPandas().sort_values("image_id").reset_index(drop=True)
    assert feats["decode_ok"].tolist() == [True, True, False, True, True]


def test_multimodal_recall_against_truth(spark_table, table):
    from datasketches_rust_spark.operators.dedup import near_dup_multimodal_clusters

    out = near_dup_multimodal_clusters(spark_table).toPandas()
    recall = pair_recall(out[["id", "cluster_id"]], table.truth)
    assert recall >= 0.99, f"dup-pair recall {recall} < 0.99"


def test_caption_only_recall(spark_table, table):
    from datasketches_rust_spark.operators.dedup import near_dup_text_clusters

    out = near_dup_text_clusters(spark_table, "image_id", "caption").toPandas()
    recall = pair_recall(out[["id", "cluster_id"]], table.truth)
    # captions alone should already recover nearly all planted pairs
    assert recall >= 0.95, f"caption-only recall {recall}"


def test_image_only_recall(spark_table, table):
    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.operators.connected_components import connected_components
    from datasketches_rust_spark.operators.dedup import assign_clusters, near_dup_image_pairs
    import pyspark.sql.functions as F

    cfg = DedupConfig()
    edges = near_dup_image_pairs(spark_table, "image_id", "phash", cfg)
    all_ids = spark_table.select(F.col("image_id").alias("id"))
    out = assign_clusters(all_ids, edges, cfg).toPandas()
    recall = pair_recall(out[["id", "cluster_id"]], table.truth)
    assert recall >= 0.95, f"image-only recall {recall}"


def test_determinism_across_partitionings(spark_table):
    from datasketches_rust_spark.operators.dedup import near_dup_multimodal_clusters

    a = near_dup_multimodal_clusters(spark_table.repartition(1)).toPandas()
    b = near_dup_multimodal_clusters(spark_table.repartition(7)).toPandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_resize_images_roundtrip(spark):
    """Resize output keeps the input_hint schema shape; area filter of
    a constant image is constant; downscaled checkerboard averages to
    mid-gray; corrupt buffers flagged not fatal."""
    import numpy as np
    import pandas as pd

    from datasketches_rust_spark.operators.images import resize_images
    from datasketches_rust_spark.sources.png import decode_image, encode_image

    flat = np.full((32, 32, 3), 200, np.uint8)
    checker = np.zeros((32, 32, 3), np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    rows = [
        ("flat", encode_image(flat, "png"), 32, 32, "png", "", 0),
        ("checker", encode_image(checker, "png"), 32, 32, "png", "", 0),
        ("corrupt", b"\x00\x01garbage", 32, 32, "png", "", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    out = {r.image_id: r for r in resize_images(df, 8, 8).collect()}
    assert out["flat"].resize_ok and out["checker"].resize_ok
    assert not out["corrupt"].resize_ok
    assert out["flat"].w == 8 and out["flat"].h == 8
    rf = decode_image(bytes(out["flat"].bytes), "png")
    assert rf.shape == (8, 8, 3) and (rf == 200).all()
    rc = decode_image(bytes(out["checker"].bytes), "png")
    # 2x2 checker block averages to ~127.5 -> rounds to 128
    assert abs(float(rc.mean()) - 127.5) < 1.0

    # nearest upscale of flat stays flat
    up = {r.image_id: r for r in resize_images(df, 64, 64, method="nearest").collect()}
    ru = decode_image(bytes(up["flat"].bytes), "png")
    assert ru.shape == (64, 64, 3) and (ru == 200).all()


def test_batched_phash_and_downscale_bit_identical():
    """The batched signature-stage kernels (downscale_batch,
    phash64_i64_batch_from_grays) must be bit-equal to the per-image
    path across mixed sizes, including the nearest-neighbor fallback
    for non-divisible dims."""
    import numpy as np

    from datasketches_rust_spark.functions.phash import (
        downscale,
        downscale_batch,
        phash64_i64_batch_from_grays,
        phash64_i64_from_gray,
        to_gray,
    )

    rng = np.random.default_rng(17)
    grays = [
        to_gray(rng.integers(0, 256, size=(int(h), int(w), 3), dtype=np.uint8))
        for h, w in rng.choice([32, 64, 128, 40, 56], size=(200, 2))
    ]
    single_feats = np.stack([downscale(g, 8).reshape(-1) for g in grays])
    assert (downscale_batch(grays, 8) == single_feats).all()
    single_ph = np.array([phash64_i64_from_gray(g) for g in grays], dtype=np.int64)
    assert (phash64_i64_batch_from_grays(grays) == single_ph).all()
    # empty input
    assert len(phash64_i64_batch_from_grays([])) == 0
