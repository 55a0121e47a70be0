"""LSH banding → candidate-pair generation (SURVEY.md §2 Part B).

Dataflow: signature struct column → ``posexplode`` of the band-key
array → ``(band_id, band_key, id)`` → ``groupBy`` the band bucket →
within-bucket pair emission **entirely JVM-side** with higher-order
array functions (collect_set → array_sort → transform/slice →
explode). No Python in the pair path: an earlier ``applyInPandas``
version spent 130 s at sf0.1 spinning pandas frames for ~150k
mostly-singleton buckets; the JVM version does the same work inside
whole-stage codegen.

Skew/scale controls (the parts that matter at 10^12 rows):

* **bucket cap**: buckets larger than ``max_bucket_size`` would emit
  O(m²) pairs (the classic LSH skew failure — millions of identical
  boilerplate captions in one bucket). For those we emit a *sorted
  chain* (consecutive-id pairs, O(m)) instead of the clique: the
  connected components downstream are identical as long as chain
  edges survive verification — over-cap buckets hold rows whose
  ``rows_per_band`` signature slots all collide, i.e. near-certain
  duplicates, so chained pairs bypass the Jaccard filter (flagged
  ``chained=1``, never silently dropped, SURVEY.md §7).
* **dedup across bands**: the same pair found in b bands is emitted b
  times; one ``groupBy(a, b)`` de-duplicates before the (expensive)
  verification join.
* AQE (skew-join splitting + partition coalescing) handles residual
  skew at runtime; the cap bounds the worst case before AQE sees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def explode_bands(df: DataFrame, id_col: str, bands_col: str = "bands") -> DataFrame:
    """(id, band_id, band_key) rows; empty-signature sentinel filtered."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.col(bands_col)).alias("band_id", "band_key"),
        )
        # empty texts carry the all-ones sentinel (−1 as int64): never pair
        .filter(F.col("band_key") != F.lit(-1))
    )


def candidate_pairs(banded: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct candidate id pairs (a < b) from band buckets.

    Pure DataFrame/codegen plan: hash-agg per bucket → conditional
    clique/chain pair arrays → explode → hash-agg distinct. Works for
    any orderable id type; output keeps the input id type.
    """
    cap = cfg.max_bucket_size
    buckets = (
        banded.groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_set("_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    clique = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "  transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "    named_struct('a', x, 'b', y, 'chained', 0))))"
    )
    chain = F.expr(
        "zip_with(slice(ids, 1, size(ids) - 1), slice(ids, 2, size(ids) - 1), "
        "  (x, y) -> named_struct('a', x, 'b', y, 'chained', 1))"
    )
    pairs = (
        buckets.select(
            F.explode(F.when(F.size("ids") <= cap, clique).otherwise(chain)).alias("p")
        )
        .select("p.a", "p.b", "p.chained")
    )
    # one row per unordered pair; a pair seen non-chained in any band
    # verifies normally (min wins over the chained flag)
    return pairs.groupBy("a", "b").agg(F.min("chained").alias("chained"))


# family codes for fused multi-family banding (operators/dedup.py)
FAMILY_TEXT, FAMILY_PHASH, FAMILY_PIXEL = 0, 1, 2


def multi_family_candidate_pairs(banded: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidate pairs from a fused multi-family banded frame
    ``(_id, family, band_id, band_key)`` — one hash-agg bucket pass and
    one pair-dedup shuffle for ALL signature families, instead of one
    pipeline per family (3× the shuffles for identical output; at
    sandbox scale the fused plan cut the multimodal pipeline's fixed
    stage cost ~2×, and at 10^12 rows it's 2 fewer full shuffles of
    the banded fan-out).

    Output: (a, b, text_chained, phash_hit, pixel_hit) where
    ``text_chained`` is null (pair never shared a text band) / 0
    (shared a normal text bucket → must pass Jaccard) / 1 (shared an
    over-cap chained text bucket → pre-verified, see module doc), and
    ``*_hit`` flag bucket-sharing in the image families (which always
    verify by exact Hamming — chains never bypass, matching
    ``near_dup_image_pairs``).
    """
    cap = cfg.max_bucket_size
    buckets = (
        banded.groupBy("family", "band_id", "band_key")
        .agg(F.array_sort(F.collect_set("_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    clique = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "  transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "    named_struct('a', x, 'b', y, 'chained', 0))))"
    )
    chain = F.expr(
        "zip_with(slice(ids, 1, size(ids) - 1), slice(ids, 2, size(ids) - 1), "
        "  (x, y) -> named_struct('a', x, 'b', y, 'chained', 1))"
    )
    pairs = (
        buckets.select(
            "family",
            F.explode(F.when(F.size("ids") <= cap, clique).otherwise(chain)).alias("p"),
        )
        .select("family", "p.a", "p.b", "p.chained")
    )
    return pairs.groupBy("a", "b").agg(
        F.min(F.when(F.col("family") == FAMILY_TEXT, F.col("chained"))).alias(
            "text_chained"
        ),
        F.max((F.col("family") == FAMILY_PHASH).cast("int")).alias("phash_hit"),
        F.max((F.col("family") == FAMILY_PIXEL).cast("int")).alias("pixel_hit"),
    )
