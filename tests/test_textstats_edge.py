"""Edge-input regressions for the text-stats operators (round-4
review): the driver testdata contains no NULL / empty / edge-whitespace
texts, so these conventions are pinned here instead of by the oracle
sweep. The shared invariant: every operator tokenizes through
``_tokens`` (no phantom empty tokens), returns one row per input doc,
and treats NULL/empty text as zero tokens — matching the Python
MinHash kernel's ``str.split()`` convention exactly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, "foo bar baz"),
        (1, "foo bar baz\n"),          # trailing newline (Spark trim keeps it)
        (2, "\tfoo bar baz"),          # leading tab
        (3, ""),                        # empty
        (4, "   "),                     # whitespace-only
        (5, None),                      # NULL text
        (6, "the cat and the dog in the house was for sale"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenizer_matches_python_split(spark, edge_docs):
    from datasketches_rust_spark.operators.textstats import _tokens
    from pyspark.sql import functions as F

    got = {
        r.doc_id: r.toks
        for r in edge_docs.select("doc_id", _tokens("text").alias("toks")).collect()
    }
    want = {
        r.doc_id: ([] if r.text is None else r.text.lower().split())
        for r in edge_docs.collect()
    }
    for did, toks in want.items():
        if got[did] is None:
            assert did == 5  # NULL propagates; operators coalesce downstream
        else:
            assert got[did] == toks, did


def test_ngram_jaccard_ignores_edge_whitespace(spark, edge_docs):
    from datasketches_rust_spark.operators.textstats import ngram_jaccard_pairs

    pairs = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(edge_docs, "doc_id", "text", 0.5).collect()
    }
    # docs 0/1/2 differ only in leading/trailing whitespace -> identical
    # shingle sets -> Jaccard exactly 1.0 for all three pairs
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0 and pairs[(1, 2)] == 1.0


def test_quality_scores_zero_tokens_for_blank(spark, edge_docs):
    from datasketches_rust_spark.operators.textstats import quality_scores

    q = {r.doc_id: r for r in quality_scores(edge_docs, "doc_id", "text").collect()}
    assert q[3].n_tokens == 0 and q[4].n_tokens == 0
    assert q[0].n_tokens == 3 and q[1].n_tokens == 3 and q[2].n_tokens == 3


def test_language_id_null_and_blank_are_und(spark, edge_docs):
    from datasketches_rust_spark.operators.textstats import language_id

    lid = {r.doc_id: r for r in language_id(edge_docs, "doc_id", "text").collect()}
    assert lid[6].predicted_lang == "en"
    for did in (3, 4, 5):
        assert lid[did].predicted_lang == "und", did
        assert lid[did].best_score == 0, did


def test_top_token_stats_keeps_every_doc(spark, edge_docs):
    from datasketches_rust_spark.operators.textstats import top_token_stats

    out = {r.doc_id: r for r in top_token_stats(edge_docs, "doc_id", "text").collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6}  # no silently dropped docs
    assert out[5].n_tokens == 0 and out[3].n_tokens == 0
    assert out[6].top_token_count == 3  # 'the' x3


def test_deterministic_split_zero_fraction_tail(spark):
    from datasketches_rust_spark.operators.textstats import deterministic_split

    df = spark.range(2000).withColumnRenamed("id", "k")
    out = (
        deterministic_split(df, ["k"], {"train": 0.9, "val": 0.1, "test": 0.0})
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r.split: r["count"] for r in out}
    # the zero-fraction tail must stay empty; val must get its ~10%
    assert counts.get("test", 0) == 0
    assert 120 <= counts["val"] <= 280
    assert counts["train"] + counts["val"] == 2000

    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        deterministic_split(df, ["k"], {"a": 1.5, "b": -0.5})


def test_checkpoint_empty_stage_roundtrips(spark, tmp_path):
    from datasketches_rust_spark.sources.checkpoint import CheckpointManager
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(20)], "doc_id long, text string")
    cp = CheckpointManager(str(tmp_path), num_buckets=4)

    def compute_empty(slice_df):
        # an edges stage of a duplicate-free corpus: zero rows
        return slice_df.select("doc_id", "_bucket").filter(F.lit(False))

    out = cp.run_stage(spark, "edges", docs, "doc_id", compute_empty)
    assert out.count() == 0
    assert out.columns == ["doc_id"]
    # resumed read (no recompute) also survives the fileless directory
    out2 = cp.run_stage(spark, "edges", docs, "doc_id", compute_empty)
    assert out2.count() == 0


def test_resumable_pipeline_on_duplicate_free_corpus(spark, tmp_path):
    from datasketches_rust_spark.operators.dedup import resumable_near_dup_pipeline

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=40).tolist())) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = resumable_near_dup_pipeline(
        spark, docs, "doc_id", "text", str(tmp_path / "wd")
    )
    got = {(r.id, r.cluster_id) for r in out.collect()}
    assert got == {(i, i) for i in range(40)}  # all singletons, no crash


def test_multimodal_clusters_custom_id_col(spark):
    from datasketches_rust_spark.operators.dedup import near_dup_multimodal_clusters
    from datasketches_rust_spark.sources.imagegen import generate_image_caption_df
    from pyspark.sql import functions as F

    df = generate_image_caption_df(spark, 60, seed=42, partitions=4)
    base = {
        (r.id, r.cluster_id)
        for r in near_dup_multimodal_clusters(df, use_pixel_simhash=True).collect()
    }
    renamed = df.withColumnRenamed("image_id", "doc_id")
    got = {
        (r.id, r.cluster_id)
        for r in near_dup_multimodal_clusters(
            renamed, id_col="doc_id", use_pixel_simhash=True
        ).collect()
    }
    assert got == base


def test_exact_distinct_ignores_null_items(spark):
    from datasketches_rust_spark.operators.skew import exact_distinct_by_key

    df = spark.createDataFrame(
        [("k1", "a"), ("k1", None), ("k2", None)], "k string, v string"
    )
    got = {r.k: r.distinct_count for r in exact_distinct_by_key(df, "k", "v").collect()}
    # COUNT(DISTINCT v): NULLs ignored -> k1 has 1, k2 has 0 (no row
    # after the null filter -> absent, same as SQL GROUP BY over an
    # empty post-filter group)
    assert got.get("k1") == 1
    assert "k2" not in got or got["k2"] == 0


def test_salted_agg_requires_salt_source(spark):
    from datasketches_rust_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("k", 1)], "k string, v long")
    with pytest.raises(ValueError, match="salt_source"):
        salted_agg(df, "k", F.sum("v"), F.sum("_partial"))


def test_sketch_aggs_integral_dispatch_survives_nulls(spark):
    """A null-carrying BIGINT group arrives in pandas as float64; the
    declared-type dispatch must still hash values via the u64 path so
    sketches from null-carrying and null-free groups union correctly."""
    from datasketches_rust_spark.operators.sketch_aggs import theta_distinct_by_key

    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("a", 7), ("b", 5), ("b", 7)],
        "k string, v long",
    )
    got = {r.k: r.distinct_estimate for r in theta_distinct_by_key(df, "k", "v").collect()}
    assert got == {"a": 2.0, "b": 2.0}

    # and a global sketch over the union counts 5 once, not twice
    from datasketches_rust_spark.operators.sketch_aggs import theta_distinct_global

    n = theta_distinct_global(df, "v").collect()[0][0]
    assert n == 2.0


def test_audio_features_short_clip_no_nan(spark):
    """Clips shorter than one FFT frame must not emit NaN features
    with decode_ok=True (they previously all collapsed onto one
    garbage fingerprint)."""
    import struct

    import pandas as pd

    from datasketches_rust_spark.operators.media import audio_features

    def pcm16(n):
        return b"".join(struct.pack("<h", (i * 997) % 2000 - 1000) for i in range(n))

    rows = [
        ("short", pcm16(100), 16000, 1, "pcm16"),
        ("one", pcm16(1), 16000, 1, "pcm16"),
        ("full", pcm16(4096), 16000, 1, "pcm16"),
    ]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int, n_channels int, fmt string"
    )
    out = {r.audio_id: r for r in audio_features(df).collect()}
    for aid in ("short", "one", "full"):
        r = out[aid]
        assert r.decode_ok, aid
        assert not pd.isna(r.zcr) and not pd.isna(r.rms), aid
    # short clips must not share one degenerate fingerprint with
    # unrelated short clips of different content
    assert out["short"].audio_simhash != out["one"].audio_simhash


def test_resize_failure_rows_do_not_claim_target_dims(spark):
    from datasketches_rust_spark.operators.images import resize_images

    df = spark.createDataFrame(
        [("bad", b"not an image", "png")], "image_id string, bytes binary, fmt string"
    )
    r = resize_images(df, 8, 8).collect()[0]
    assert r.resize_ok is False
    assert r.w is None and r.h is None
    assert bytes(r.bytes) == b"not an image"
