"""Text-analysis operators for training-data pipelines: exact n-gram
Jaccard dedup, language identification, quality scoring.

All of these are pure DataFrame/SQL plans (no UDFs) so they stay
inside whole-stage codegen AND are DuckDB-oracle-expressible — the
exact counterparts of the estimation-regime sketch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language-specific stopword markers for the n-gram/stopword heuristic;
# deterministic and SQL-expressible (the classifier contract is
# determinism + cross-engine parity, not linguistic accuracy)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|was|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|dans|pour|une)\b",
    "es": r"\b(el|la|los|y|es|en|por|una)\b",
}


def _tokens(col) -> F.Column:
    """Lowercased whitespace tokens with NO empty strings — THE
    tokenizer every operator in this module shares. ``split`` on
    ``\\s+`` yields '' elements for leading/trailing whitespace of any
    kind (Spark's ``trim`` strips only spaces, so a trailing tab or
    newline previously produced a phantom empty token); removing them
    makes this exactly Python's ``str.split()`` — the MinHash kernel's
    convention (functions/minhash.py::tokenize) — for every input, not
    just space-trimmed ones."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.array_remove(F.split(F.lower(c), r"\s+"), "")


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (``_id``, ``tok``) word-3-gram shingle frame — THE
    shingle convention shared by in-set (:func:`ngram_jaccard_pairs`)
    and cross-set (:func:`crossset_jaccard_pairs`) exact Jaccard, and
    mirrored verbatim by their DuckDB oracles: texts with < 3 tokens
    contribute one whole-text shingle (the MinHash kernel's convention,
    functions/minhash.py). One definition (:func:`_tokens`) so a
    tokenizer change can never desynchronize the two operators."""
    from ..session import ensure_min_partitions

    arr = _tokens(text_col)
    base = ensure_min_partitions(
        df.select(F.col(id_col).alias("_id"), arr.alias("_arr"))
    )
    shingle_arr = F.when(
        F.size("_arr") >= 3,
        F.expr(
            "transform(sequence(0, size(_arr) - 3),"
            " i -> concat_ws(' ', slice(_arr, i + 1, 3)))"
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("_arr"))))
    return (
        base.select("_id", F.explode(shingle_arr).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact word-3-gram-shingle Jaccard pairs >= threshold via the
    distributed shingle-join algorithm: distinct (doc, shingle) →
    self-join on shingle → |A ∩ B| per pair → Jaccard with per-doc
    set sizes. Texts with < 3 tokens contribute one whole-text
    shingle (the MinHash kernel's convention, functions/minhash.py).

    Exact (oracle-checkable) counterpart of MinHash-LSH dedup.

    ``max_doc_freq`` is the web-scale knob: the shingle self-join is
    quadratic in the document frequency of the hottest shingle, so at
    scale boilerplate shingles ("terms of service …") must be dropped
    before the join. When set, shingles appearing in more than
    ``max_doc_freq`` documents are removed from the REPRESENTATION
    (both intersections and set sizes — i.e. Jaccard over non-stop
    shingles, a deterministic, well-defined semantic), the hot list is
    broadcast for an anti-join, and the number of dropped shingles is
    logged — never silently truncated. None (the oracle-checked
    default) keeps exactness.
    Returns (a, b, jaccard).
    """
    # checkpointed: the shingle frame feeds BOTH sides of the self-join
    # plus the set-size agg (and optionally the DF-cap agg) — without
    # it the tokenize+explode+distinct subtree recomputes per consumer
    toks = _distinct_shingles(df, id_col, text_col).localCheckpoint(eager=True)
    if max_doc_freq is not None:
        import logging

        hot = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("tok")
        )
        n_hot = hot.count()
        logging.getLogger(__name__).warning(
            "ngram_jaccard_pairs: dropping %d shingles with doc-freq > %d",
            n_hot,
            max_doc_freq,
        )
        if n_hot:
            toks = toks.join(F.broadcast(hot), "tok", "left_anti")
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        toks.alias("x")
        .join(toks.alias("y"), on="tok")
        .filter(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("n", "na"), on="a")
        .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("n", "nb"), on="b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language classifier: score per language = count
    of marker-regex matches, predict argmax (ties → 'und', zero hits →
    'und'). Deterministic, JVM-side, SQL-expressible.
    Returns (id, predicted_lang, best_score).
    """
    t = F.lower(F.col(text_col))
    scores = [
        # coalesce: regexp_count(NULL) is NULL, which would make every
        # downstream comparison NULL and emit (NULL, NULL) instead of
        # the documented zero-hits → 'und'
        F.coalesce(F.regexp_count(t, F.lit(rx)), F.lit(0)).alias(f"score_{lang}")
        for lang, rx in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    # deterministic argmax: ties (or zero hits) classify as 'und'
    n_at_best = sum(
        F.when(F.col(f"score_{lg}") == best, 1).otherwise(0) for lg in langs
    )
    pred = F.when(best == 0, F.lit("und")).when(n_at_best > 1, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        best.cast("long").alias("best_score"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality metrics (length, token stats, char-class
    ratios) — all built-ins, all SQL-expressible.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(_tokens(t)).cast("long")
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("long")
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long")
    n_space = F.length(F.regexp_replace(t, "[^ ]", "")).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("alpha_ratio"),
        (n_space.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("space_ratio"),
        (n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")).alias("chars_per_token"),
    )


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE-style pre-tokenization counts — the GPT-2-family splitter's
    shape (letter runs / digit runs / single punctuation, the
    coarse-grained version of the published GPT-2 pattern without
    look-aheads so it stays engine-portable and SQL-expressible).
    ``n_bpe_tokens`` upper-bounds the post-merge BPE token count and is
    the standard cheap budget estimator in training-data pipelines;
    reported next to whitespace tokens and the subword expansion ratio.
    Pure codegen (regexp built-ins), oracle-checkable.
    Returns (id, n_bpe_tokens, n_ws_tokens, bpe_per_ws).
    """
    t = F.col(text_col)
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))).cast("long")
    ws = F.size(F.split(F.trim(t), r"\s+")).cast("long")
    return df.select(
        F.col(id_col),
        bpe.alias("n_bpe_tokens"),
        ws.alias("n_ws_tokens"),
        (bpe.cast("double") / F.greatest(ws, F.lit(1)).cast("double")).alias("bpe_per_ws"),
    )


def stratified_sample_by_key(
    df: DataFrame, key_col: str, n_per_key: int, order_cols: list[str]
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_key`` rows with the
    smallest md5 fingerprint of ``order_cols`` per key — the
    training-data subsampling idiom (per-source caps, eval-split
    carving) done WITHOUT rand(): the selection is a pure function of
    row content, so it is reproducible across runs, partitionings, and
    engines. ``order_cols`` must identify rows uniquely (an id column):
    duplicate fingerprints would leave row_number ties to partition
    order, breaking the determinism contract.
    One window shuffle on the key; a hot key's sample
    is bounded by ``n_per_key`` regardless of its row count.
    Returns the original columns plus ``sample_rank``.
    """
    from pyspark.sql import Window

    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in order_cols]))
    w = Window.partitionBy(key_col).orderBy(fp)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_key)
    )


def deterministic_split(
    df: DataFrame, id_cols: list[str], fractions: dict[str, float]
) -> DataFrame:
    """Assign every row to a named split (train/val/test …) as a pure
    function of its id — the rand()-free dataset-carving idiom: stable
    across runs, engines, and partitionings, and any row's split can
    be recomputed from its id alone (the property leakage audits
    need). Implementation: the row's md5 hex digest is compared
    lexicographically against cumulative-fraction thresholds expressed
    as 32-char hex strings — md5 is uniform over the hex-string space
    and both Spark and DuckDB produce identical lowercase digests, so
    the assignment is SQL-oracle-checkable verbatim.
    Returns the input plus ``split``.
    """
    from fractions import Fraction

    fracs = {k: Fraction(str(v)) for k, v in fractions.items()}
    if any(f < 0 or f > 1 for f in fracs.values()):
        raise ValueError("each fraction must be in [0, 1]")
    if sum(fracs.values()) != 1:
        raise ValueError("fractions must sum to 1")
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols]))
    expr = None
    cum = Fraction(0)
    names = list(fracs)
    for name in names[:-1]:
        cum += fracs[name]
        # exact rational → hex threshold (float math would drift the
        # constant away from the SQL oracle's hand-written threshold).
        # Clamp at the all-'f' digest: cum == 1 before the last name
        # (trailing zero-fraction splits) would otherwise format as a
        # 33-char string that compares LESS than most digests and
        # mis-assigns the whole tail
        raw = (cum.numerator * 16**32) // cum.denominator
        threshold = format(min(raw, 16**32 - 1), "032x")
        cond = fp <= F.lit(threshold) if raw >= 16**32 else fp < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals, the per-row-codegen subset:
    token count, distinct-token fraction, and distinct-bigram fraction.
    Low distinct fractions flag boilerplate / keyword-stuffed documents
    before they reach the (more expensive) near-dup pipeline. All
    array built-ins — whole-stage codegen, SQL-expressible.
    Returns (id, n_tokens, distinct_token_frac, distinct_bigram_frac).
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n, F.lit(1)).cast("double")
        ).alias("distinct_token_frac"),
        (
            F.size(F.array_distinct(bigrams)).cast("double")
            / F.greatest(F.size(bigrams), F.lit(1)).cast("double")
        ).alias("distinct_bigram_frac"),
    )


def top_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Top-token coverage (the other half of the Gopher repetition
    battery): the share of a document taken by its single most frequent
    token. Explode → (doc, token) count → per-doc max/sum: two hash
    aggregations whose keys distribute evenly even for hot documents
    (a doc's tokens spread over (doc, token) composite keys first), so
    the plan carries no per-doc skew at 10^12 rows. Ties return only
    the max count, never an arbitrary token — deterministic output.
    Returns (id, n_tokens, top_token_count, top_token_frac).
    """
    exploded = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    counts = exploded.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.max("c").cast("long").alias("top_token_count"),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top_token_frac"
        ),
    )
    # join back: explode emits no rows for NULL/empty text, which would
    # silently drop those documents from the output — every sibling
    # per-doc stat operator returns one row per input doc
    return (
        df.select(F.col(id_col))
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("top_token_count"), F.lit(0)).alias("top_token_count"),
            F.col("top_token_frac"),
        )
    )


def crossset_jaccard_pairs(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental corpus dedup: exact word-3-gram-shingle Jaccard
    pairs between a NEW document batch and an existing INDEX — the
    production shape of near-dup detection (today's crawl against the
    corpus already ingested), the batch analog of the streaming
    delta-banding hook (`streaming/incremental.py`). Same shingle
    convention as :func:`ngram_jaccard_pairs` (< 3 tokens → one
    whole-text shingle), but the shingle join is STRICTLY cross-set:
    new×new and index×index pairs are never generated, so a daily
    batch joins in O(|new| × collision rate), not O(|corpus|²) — at
    10^12 indexed docs the index side's per-shingle posting lists are
    the only thing the new batch touches.
    Returns (new_id, index_id, jaccard).
    """
    new_toks = _distinct_shingles(new_df, id_col, text_col).localCheckpoint(
        eager=True
    )
    idx_toks = _distinct_shingles(index_df, id_col, text_col).localCheckpoint(
        eager=True
    )
    new_sizes = new_toks.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    idx_sizes = idx_toks.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        new_toks.alias("x")
        .join(idx_toks.alias("y"), on="tok")
        .groupBy(F.col("x._id").alias("new_id"), F.col("y._id").alias("index_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            new_sizes.withColumnRenamed("_id", "new_id").withColumnRenamed("n", "na"),
            on="new_id",
        )
        .join(
            idx_sizes.withColumnRenamed("_id", "index_id").withColumnRenamed("n", "nb"),
            on="index_id",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("new_id", "index_id", "jaccard")
    )


def benchmark_ngram_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_text_col: str,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination by token-n-gram collision — the
    standard pretraining scrub: a corpus document that shares any
    ``n``-token span with an evaluation benchmark is contaminated and
    must be dropped before training. Distinct corpus (doc, n-gram)
    pairs semi-join the benchmark's distinct n-gram set; per-doc
    overlap counts come from one hash aggregation.

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval suites are MBs against TBs), so it is broadcast — the corpus
    never shuffles on n-gram; the only wide exchange is the per-doc
    count agg, keyed by doc id (uniform). Documents shorter than ``n``
    tokens contribute no n-grams (never a whole-text fallback — a
    short doc can't contain a full benchmark span).
    Returns (id, n_overlapping_ngrams, contaminated boolean) for every
    input document.
    """
    def ngrams(col: str, width: int):
        arr = _tokens(col)
        grams = F.transform(
            F.sequence(F.lit(0), F.size(arr) - width),
            lambda i: F.concat_ws(" ", F.slice(arr, i + 1, width)),
        )
        return F.when(F.size(arr) >= width, grams).otherwise(
            F.array().cast("array<string>")
        )

    # per-doc dedupe happens inside the row (array_distinct) — a
    # document's grams never leave their row before the broadcast join,
    # so the corpus is NEVER shuffled on n-gram; the per-doc count agg
    # below is the only wide exchange. (A naive distinct on the
    # exploded (doc, gram) frame re-shuffles the whole corpus keyed by
    # gram — measured 4.2 s → 2.8 s at sf0.1 from this alone.)
    bench = (
        benchmark_df.select(
            F.explode(F.array_distinct(ngrams(bench_text_col, n))).alias("g")
        )
        .distinct()
    )
    from ..session import ensure_min_partitions

    corpus = ensure_min_partitions(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(text_col, n))).alias("g"),
    )
    hits = (
        corpus.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping_ngrams"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlapping_ngrams"), F.lit(0))
            .cast("long")
            .alias("n_overlapping_ngrams"),
            (F.coalesce(F.col("n_overlapping_ngrams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def contamination_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII / contamination indicators per document — the pre-training
    scrub pass: counts of email-, URL-, and long-digit-run-shaped
    spans (deliberately simple, engine-portable regexes — the contract
    is determinism + cross-engine parity, not detector recall; swap in
    a real PII model via mapInPandas where policy requires it).
    Pure codegen, SQL-expressible. Returns (id, n_emails, n_urls,
    n_long_digit_runs, flagged boolean).
    """
    t = F.col(text_col)
    n_emails = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), F.lit(0))
    ).cast("long")
    n_urls = F.size(
        F.regexp_extract_all(t, F.lit(r"https?://[^\s]+"), F.lit(0))
    ).cast("long")
    n_digit_runs = F.size(
        F.regexp_extract_all(t, F.lit(r"[0-9]{9,}"), F.lit(0))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_digit_runs.alias("n_long_digit_runs"),
        ((n_emails > 0) | (n_urls > 0) | (n_digit_runs > 0)).alias("flagged"),
    )
