"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``datasketches_rust_spark`` — PySpark-native near-duplicate
detection + mergeable-sketch analytics (see SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasketches_rust_spark.config import DedupConfig, ThetaConfig
from datasketches_rust_spark.operators.dedup import near_dup_text_clusters
from datasketches_rust_spark.operators.signatures import simhash_col
from datasketches_rust_spark.config import SimHashConfig
from datasketches_rust_spark.operators.sketch_aggs import (
    bloom_build,
    bloom_semi_filter,
    countmin_weights_by_key,
    frequent_items_by_count,
    hll_distinct_by_key,
    tdigest_stats,
    theta_distinct_by_key,
    theta_distinct_global,
    theta_intersect_groups,
)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup clustering of sf0.001 documents (MinHash →
    LSH banding → verified pairs → connected components)."""
    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    return near_dup_text_clusters(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# queries — one per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------


def _q_neardup_text_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return near_dup_text_clusters(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.col("cluster_id")
    )


def _q_theta_distinct_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer")
    out = theta_distinct_by_key(cust, "c_nationkey", "c_custkey", ThetaConfig(lg_k=15))
    return out.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("distinct_estimate").cast("long").alias("distinct_custkeys"),
    )


def _q_theta_union_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    out = theta_distinct_global(orders, "o_custkey", ThetaConfig(lg_k=15))
    return out.select(F.col("distinct_estimate").cast("long").alias("distinct_custkeys"))


def _q_theta_intersect_even_odd(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    keyed = orders.select("o_custkey", (F.col("o_orderkey") % 2 == 0).alias("even"))
    out = theta_intersect_groups(keyed, "o_custkey", "even", ThetaConfig(lg_k=15))
    return out.select(
        F.col("intersection_estimate").cast("long").alias("custkeys_in_both")
    )


def _q_frequent_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _read(spark, sf_dir, "part")
    out = frequent_items_by_count(part, "p_brand", max_map_size=256)
    return out.select(
        F.col("p_brand").alias("brand"),
        F.col("est_count"),
        F.col("lower_bound"),
        F.col("upper_bound"),
    )


def _q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_alpha.alias("n_alpha"),
        (n_alpha.cast("double") / F.length("text").cast("double")).alias("alpha_ratio"),
        (F.length("text").cast("double") / n_tokens.cast("double")).alias("avg_token_span"),
    )


def _q_tdigest_price_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    out = tdigest_stats(li, "l_extendedprice", quantiles=(0.5, 0.9))
    # min/max/total_weight are exactly maintained (`tdigest/sketch.rs:
    # 171-183, 214-216`) → oracle-checkable; quantiles are not
    return out.select("min_value", "max_value", "total_weight")


def _q_tdigest_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return tdigest_stats(li, "l_extendedprice", quantiles=(0.5, 0.9, 0.99)).select(
        "q_50", "q_90", "q_99"
    )


def _q_countmin_suppkey_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    out = countmin_weights_by_key(li, "l_suppkey", "qty", num_hashes=3, num_buckets=16384)
    # collision-free config at this scale → exact (verified vs oracle)
    return out.select(F.col("l_suppkey").alias("suppkey"), F.col("est_weight").alias("total_qty"))


def _q_bloom_custkey_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    cust = _read(spark, sf_dir, "customer")
    blob = bloom_build(orders, "o_custkey", max_items=200_000, fpp=1e-9)
    # fpp 1e-9 on <= ~100k probes → deterministic no-false-positive
    # regime (verified vs the semi-join oracle); no false negatives by
    # construction (`bloom/sketch.rs` membership contract)
    return bloom_semi_filter(cust, "c_custkey", blob).select(
        F.col("c_custkey").alias("custkey")
    )


def _q_hll_distinct_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer")
    out = hll_distinct_by_key(cust, "c_nationkey", "c_custkey", lg_k=12)
    return out.select(F.col("c_nationkey").alias("nationkey"), F.col("hll_estimate"))


def _q_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_col("text", SimHashConfig()).alias("simhash"))


def _q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.textstats import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.col("jaccard")
    )


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.textstats import language_id

    docs = _read(spark, sf_dir, "documents")
    return language_id(docs, "doc_id", "text")


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.textstats import quality_scores

    docs = _read(spark, sf_dir, "documents")
    return quality_scores(docs, "doc_id", "text")


def _q_ann_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.ann import cosine_topk_bruteforce

    emb = _read(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_bruteforce(emb, probes, "vec_id", "embedding", k=5)


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.ann import embedding_neardup_pairs

    emb = _read(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, "vec_id", "embedding", cosine_threshold=0.9)


def _q_substring_match_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasketches_rust_spark.operators.substring_match import substring_match_pairs

    docs = _read(spark, sf_dir, "documents")
    return substring_match_pairs(docs, "doc_id", "text", min_len=30).select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.col("common_len")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "neardup_text_clusters": _q_neardup_text_clusters,
        "theta_distinct_by_nation": _q_theta_distinct_by_nation,
        "theta_union_orders": _q_theta_union_orders,
        "theta_intersect_even_odd": _q_theta_intersect_even_odd,
        "frequent_brands": _q_frequent_brands,
        "exact_dedup_documents": _q_exact_dedup_documents,
        "token_counts": _q_token_counts,
        "text_quality": _q_text_quality,
        "simhash_documents": _q_simhash_documents,
        "substring_match_documents": _q_substring_match_documents,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "language_id": _q_language_id,
        "quality_scores": _q_quality_scores,
        "ann_topk_embeddings": _q_ann_topk_embeddings,
        "embedding_neardup": _q_embedding_neardup,
        "tdigest_price_minmax": _q_tdigest_price_minmax,
        "tdigest_price_quantiles": _q_tdigest_price_quantiles,
        "countmin_suppkey_weights": _q_countmin_suppkey_weights,
        "bloom_custkey_members": _q_bloom_custkey_members,
        "hll_distinct_by_nation": _q_hll_distinct_by_nation,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # exact-regime sketch queries (theta exact mode == COUNT DISTINCT,
        # `theta/sketch.rs:164-171`; MG exact below 0.75*M distinct,
        # `frequencies/mod.rs:43-63`)
        "theta_distinct_by_nation": """
            SELECT c_nationkey AS nationkey,
                   COUNT(DISTINCT c_custkey) AS distinct_custkeys
            FROM customer GROUP BY c_nationkey
        """,
        "theta_union_orders": """
            SELECT COUNT(DISTINCT o_custkey) AS distinct_custkeys FROM orders
        """,
        "theta_intersect_even_odd": """
            SELECT COUNT(*) AS custkeys_in_both FROM (
                SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
                INTERSECT
                SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1
            )
        """,
        "frequent_brands": """
            SELECT p_brand AS brand,
                   COUNT(*) AS est_count,
                   COUNT(*) AS lower_bound,
                   COUNT(*) AS upper_bound
            FROM part GROUP BY p_brand
        """,
        "exact_dedup_documents": """
            SELECT md5(text) AS text_md5,
                   COUNT(*) AS dup_count,
                   MIN(doc_id) AS canonical_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "text_quality": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
                   length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                       / length(text)::DOUBLE AS alpha_ratio,
                   length(text)::DOUBLE
                       / len(regexp_split_to_array(trim(text), '\\s+'))::DOUBLE
                       AS avg_token_span
            FROM documents
        """,
        "tdigest_price_minmax": """
            SELECT MIN(l_extendedprice) AS min_value,
                   MAX(l_extendedprice) AS max_value,
                   COUNT(*) AS total_weight
            FROM lineitem
        """,
        "countmin_suppkey_weights": """
            SELECT l_suppkey AS suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS total_qty
            FROM lineitem GROUP BY l_suppkey
        """,
        "bloom_custkey_members": """
            SELECT c_custkey AS custkey FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
        """,
        "ngram_jaccard_pairs": """
            WITH tok_arrays AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
                FROM documents
            ),
            toks AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN len(arr) >= 3
                            THEN arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                            ELSE array_to_string(arr, ' ') END AS tok
                FROM tok_arrays,
                     UNNEST(CASE WHEN len(arr) >= 3
                                 THEN range(1, len(arr) - 1)
                                 ELSE [1] END) AS t(i)
                WHERE CASE WHEN len(arr) >= 3
                           THEN arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                           ELSE array_to_string(arr, ' ') END <> ''
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS inter
                FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            )
            SELECT doc_a, doc_b,
                   inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE >= 0.5
        """,
        "language_id": """
            WITH scored AS (
                SELECT doc_id,
                    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|was|for)\\b')) AS score_en,
                    len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|mit|ein)\\b')) AS score_de,
                    len(regexp_extract_all(lower(text), '\\b(le|la|les|et|est|dans|pour|une)\\b')) AS score_fr,
                    len(regexp_extract_all(lower(text), '\\b(el|la|los|y|es|en|por|una)\\b')) AS score_es
                FROM documents
            )
            SELECT doc_id,
                CASE
                    WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
                    WHEN (CASE WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 1 ELSE 0 END
                        + CASE WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 1 ELSE 0 END
                        + CASE WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 1 ELSE 0 END
                        + CASE WHEN score_es = greatest(score_en, score_de, score_fr, score_es) THEN 1 ELSE 0 END) > 1 THEN 'und'
                    WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                    ELSE 'es'
                END AS predicted_lang,
                greatest(score_en, score_de, score_fr, score_es)::BIGINT AS best_score
            FROM scored
        """,
        "quality_scores": """
            SELECT doc_id,
                length(text)::BIGINT AS n_chars,
                len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens,
                length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS n_alpha,
                length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
                length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                    / greatest(length(text), 1)::DOUBLE AS alpha_ratio,
                length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
                    / greatest(length(text), 1)::DOUBLE AS space_ratio,
                length(text)::DOUBLE
                    / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1)::DOUBLE
                    AS chars_per_token
            FROM documents
        """,
        "ann_topk_embeddings": """
            WITH scored AS (
                SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                       list_cosine_similarity(p.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine
                FROM embeddings p, embeddings c
                WHERE p.vec_id < 10 AND p.vec_id != c.vec_id
            )
            SELECT probe_id, neighbor_id, rank FROM (
                SELECT probe_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id
                       ) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        # neardup_text_clusters / simhash_documents / tdigest quantiles /
        # hll estimates / embedding_neardup (LSH subset of exact pairs):
        # murmur-seeded LSH + CC / estimation-regime sketches — not
        # SQL-expressible; driver records rows-only checks, pytest
        # covers them (NumPy oracle + tolerance gates).
    }
