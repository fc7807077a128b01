"""Text-analysis operators for large-scale training-data pipelines.

DataFrame-in/DataFrame-out column transforms for the document tier of an
LLM data pipeline: tokenization, token counting (whitespace and a
BPE-ish regex), shingling, quality scoring, n-gram-heuristic language
identification, and document fingerprinting.

Every function here is a pure narrow transformation built from JVM-side
``pyspark.sql.functions`` (no Python UDFs): at 100 TB these run inside
whole-stage codegen at scan speed, shuffle nothing, and push column
pruning down to the parquet reader. All are deterministic so results
are reproducible across retries and AQE re-planning.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# small per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "des"),
    "es": ("el", "la", "los", "y", "es", "una", "en", "por", "que", "con"),
}

# BPE-ish pre-tokenizer: words | numbers | single non-space symbols.
# Kept to a regex subset with identical semantics in Java regex (Spark)
# and RE2 (DuckDB oracle).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokenize(text: Column) -> Column:
    """Lower-cased whitespace tokens, empty strings dropped."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > F.lit(0)
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokenize(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: words, number runs and individual symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def ngrams(tokens: Column, n: int = 3) -> Column:
    """All n-token grams (space-joined), order kept, duplicates kept.

    ``tokens`` is bound once per row as a lambda variable (the one-element
    ``transform`` wrapper); without the binding, a composed expression like
    ``ngrams(tokenize(text))`` would re-evaluate the whole tokenizer for
    every ``element_at`` — O(grams x n x tokens) per row instead of
    O(tokens + grams x n)."""

    def _grams_of(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[
                    F.element_at(toks, (i + F.lit(j + 1)).cast("int"))
                    for j in range(n)
                ],
            ),
        )
        # guard: for < n tokens, sequence(0, negative) would REVERSE
        # (Spark emits a descending sequence), feeding element_at
        # non-positive indices — return no grams instead
        return F.when(F.size(toks) >= F.lit(n), grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokens), _grams_of), 1)


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined), in first-occurrence order."""
    return F.array_distinct(ngrams(tokens, n))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition: duplicate n-gram fraction per document
    (the Gopher-style repetition filter signal) —
    DF[<id>, n_ngrams, n_distinct_ngrams, dup_ngram_frac].

    Pure per-row column algebra: no shuffle at all, runs at scan speed
    over 100 TB. Documents shorter than ``n`` tokens report zero grams
    and fraction 0.0."""
    grams = ngrams(tokenize(F.col(text_col)), n)
    stats = df.select(
        F.col(id_col),
        F.size(grams).alias("_n"),
        F.size(F.array_distinct(grams)).alias("_nd"),
    )
    return stats.select(
        F.col(id_col),
        F.greatest(F.col("_n"), F.lit(0)).alias("n_ngrams"),
        F.greatest(F.col("_nd"), F.lit(0)).alias("n_distinct_ngrams"),
        F.when(F.col("_n") > 0, 1.0 - F.col("_nd") / F.col("_n"))
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )


def ngram_overlap(
    df: DataFrame,
    ref: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    min_shared: int = 1,
) -> DataFrame:
    """Cross-corpus n-gram contamination: document pairs sharing >=
    ``min_shared`` distinct n-grams with a reference corpus (train/benchmark
    decontamination) — DF[<id>, <ref_id>, n_shared].

    Scale path: both sides explode to an inverted (shingle -> id) index
    and meet in ONE equi-join keyed on the shingle — never an all-pairs
    comparison; hot shingles are AQE-skew-split and can be pre-filtered
    by document frequency upstream. Self-joins (same table both sides)
    exclude identical ids."""
    left = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(tokenize(F.col(text_col)), n)).alias("_sh"),
    )
    right = ref.select(
        F.col(ref_id_col).alias("_ref_id"),
        F.explode(shingles(tokenize(F.col(ref_text_col)), n)).alias("_sh"),
    )
    out_id = id_col if id_col != ref_id_col else f"{id_col}"
    out_ref = ref_id_col if ref_id_col != id_col else f"ref_{ref_id_col}"
    return (
        left.join(right, on="_sh")
        .filter(F.col("_id") != F.col("_ref_id"))
        .groupBy(
            F.col("_id").alias(out_id), F.col("_ref_id").alias(out_ref)
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_shared))
    )


def quality_scores(text: Column) -> dict[str, Column]:
    """Quality-signal columns: length, token stats, punctuation and
    stopword ratios, and a composite keep/drop heuristic (Gopher-style
    thresholds on length and symbol density)."""
    toks = tokenize(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    avg_token_len = F.when(n_tokens > 0, (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / n_tokens.cast("double")
    )).otherwise(F.lit(0.0))
    punct_chars = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct_chars / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    stopword_ratio = F.when(
        n_tokens > 0, stop_hits / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    keep = (
        (n_tokens >= 5)
        & (avg_token_len >= 2.0)
        & (avg_token_len <= 15.0)
        & (punct_ratio <= 0.3)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "keep": keep,
    }


def with_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_scores(F.col(text_col))
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df


def language_id(text: Column, langs: Optional[Sequence[str]] = None) -> Column:
    """Stopword-hit language heuristic: the language whose stopword list
    overlaps the document's distinct tokens the most (ties -> 'und', no
    hits -> 'und' for undetermined). A real pipeline would swap in a
    character-n-gram model; the argmax plumbing is identical."""
    langs = list(langs or LANG_STOPWORDS.keys())
    toks = F.array_distinct(tokenize(text))
    scored = [
        F.struct(
            F.size(
                F.array_intersect(
                    toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
                )
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang in langs
    ]
    # max by (hits asc, lang desc) reversed: array_max picks highest hits,
    # ties broken toward the lexicographically *larger* lang name — invert
    # by sorting on (hits, negated position) is messier; use (hits, lang)
    # struct max and accept lexicographic-max tie-break, documented.
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lower-cased
    text. Identical normalization on the DuckDB oracle side makes this
    cross-engine stable (unlike xxhash64, which is Spark-specific)."""
    return F.md5(F.concat_ws(" ", tokenize(text)))


def minhash_fingerprint(text: Column, n: int = 3) -> Column:
    """Rolling-shingle fingerprint: the minimum md5 over the document's
    n-token shingles (a 1-permutation MinHash; documents sharing it are
    near-dup candidates)."""
    return F.array_min(F.transform(shingles(tokenize(text), n), F.md5))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window token chunking (context-window prep for LLM
    training / RAG indexing) — DF[<id>, chunk_idx, n_chunk_tokens,
    chunk_text].

    Windows are ``size`` whitespace tokens with ``overlap`` tokens shared
    between consecutive chunks (stride = size - overlap). A chunk is
    emitted only if it contributes at least one token not covered by the
    previous chunk, so trailing windows fully contained in their
    predecessor are dropped; a document shorter than one window yields a
    single chunk, and an empty document yields none. ``chunk_idx`` is the
    0-based window index in document order.

    Scale path: a pure narrow transformation — tokenize once per row,
    ``posexplode`` over the start offsets, ``slice`` per window. No
    shuffle, no UDF; at 100 TB this runs inside whole-stage codegen at
    scan speed and grows output size by ~size/stride ×, which the
    parquet writer absorbs per-partition."""
    from graphframes_spark.util import GraphFramesError

    if size < 1:
        raise GraphFramesError(f"chunk size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise GraphFramesError(
            f"overlap must be in [0, size), got overlap={overlap} size={size}"
        )
    stride = size - overlap
    toks = df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    # last admissible start: the largest one whose window still covers a
    # new token (start < n - overlap); sequence() is inclusive, so clamp
    # the upper bound at 0 for short docs (single whole-document chunk)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - F.lit(1 + overlap), F.lit(0)), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = toks.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(F.slice("_toks", F.col("_start") + 1, size)).alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("_toks", F.col("_start") + 1, size)).alias("chunk_text"),
    )


def normalize_text(text: Column) -> Column:
    """Dedup-normalized text: lower-case, non-alphanumerics collapsed to
    single spaces, trimmed. The standard pre-pass before exact/near-dup
    hashing so trivial formatting variants collide. Regex kept to the
    subset with identical semantics in Java regex (Spark) and RE2
    (DuckDB), so oracles can replay it verbatim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


# PII patterns shared by redact_pii and its oracle: a regex subset with
# identical semantics in Java regex and RE2 (no backrefs, no lookaround)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub for training corpora — DF[<id>, redacted_text,
    n_emails, n_ips, n_phones].

    Emails, IPv4 addresses and NNN-NNN-NNNN phone numbers are replaced
    with <EMAIL>/<IP>/<PHONE> sentinels (applied in that order so an
    already-redacted span is never re-matched) and per-document match
    counts are kept for corpus audit rollups. Pure ``regexp_replace`` /
    ``regexp_extract_all`` — codegen-resident, no shuffle, no UDF; at
    100 TB this runs at parquet scan speed with column pruning."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
                PII_IPV4,
                "<IP>",
            ),
            PII_PHONE,
            "<PHONE>",
        ).alias("redacted_text"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF —
    DF[<id>, term, score, rank].

    score = tf(term, doc) · ln(N / df(term)), rounded to 6 decimals
    before ranking so the (score DESC, term ASC) tie-break is stable
    across engines; terms present in every document score 0.

    Scale path: one explode + two partial-aggregatable hash
    aggregations (term frequency keyed on (doc, term); document
    frequency keyed on term), a shuffle join on term against the
    term-dictionary (vocabulary-sized, typically many orders smaller
    than the corpus), the corpus size N broadcast from a 1-row
    aggregate, and a top-k window partitioned by document id — no
    global sort, no driver-side data."""
    from graphframes_spark.util import GraphFramesError

    if k < 1:
        raise GraphFramesError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("_tf") * F.log(F.col("_n") / F.col("_df").cast("double")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def boilerplate_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_doc_frac: float = 0.5,
    min_doc_count: int = 2,
) -> DataFrame:
    """DF[segment, doc_freq] — the corpus's boilerplate segments.

    A segment (text split on the literal ``delimiter``; lines by
    default) is boilerplate when its trimmed form is non-empty and
    appears in at least ``min_doc_count`` documents AND at least
    ``min_doc_frac`` of all documents — the CCNet-style headers /
    footers / nav-bars signal (with ``delimiter=" "`` it degenerates to
    corpus-adaptive stopword discovery).

    Scale posture: one posexplode (narrow), one distinct-doc count per
    segment key (two-phase hash aggregate), and a driver-side 1-row doc
    count for the threshold — no window, no per-doc state.
    """
    import re as _re

    segs = df.select(
        F.col(id_col).alias("_bp_id"),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delimiter), -1)
        ).alias("_bp_pos", "_bp_seg"),
    )
    n_docs = df.select(F.col(id_col)).distinct().count()
    threshold = max(min_doc_count, 1)
    key = F.trim(F.col("_bp_seg"))
    return (
        segs.filter(F.length(key) > 0)
        .groupBy(key.alias("segment"))
        .agg(F.count_distinct(F.col("_bp_id")).alias("doc_freq"))
        .filter(
            (F.col("doc_freq") >= F.lit(threshold))
            & (
                F.col("doc_freq").cast("double")
                >= F.lit(float(min_doc_frac)) * F.lit(float(n_docs))
            )
        )
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_doc_frac: float = 0.5,
    min_doc_count: int = 2,
) -> DataFrame:
    """DF[<id_col>, <text_col>, n_segments, n_removed] — documents with
    corpus-frequent segments stripped (see :func:`boilerplate_segments`
    for the boilerplate definition; whitespace-only segments are never
    boilerplate and are preserved verbatim).

    Rebuild is one left join of the exploded segments against the
    (small, broadcastable) boilerplate table plus one per-document
    aggregation: ``collect_list`` skips the nulled-out boilerplate rows
    and is bounded by a single document's segment count — per-doc state,
    never corpus- or hub-sized. Order is restored by ``array_sort`` on
    the (pos, segment) structs, so the operator is deterministic under
    any shuffle/AQE placement.
    """
    import re as _re

    boiler = boilerplate_segments(
        df, id_col, text_col, delimiter, min_doc_frac, min_doc_count
    )
    segs = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delimiter), -1)
        ).alias("_bp_pos", "_bp_seg"),
    )
    joined = segs.join(
        F.broadcast(boiler.withColumn("_bp_is_boiler", F.lit(True))),
        on=F.trim(segs["_bp_seg"]) == boiler["segment"],
        how="left",
    )
    kept_struct = F.when(
        F.col("_bp_is_boiler").isNull(),
        F.struct(F.col("_bp_pos"), F.col("_bp_seg")),
    )
    return joined.groupBy(id_col).agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["_bp_seg"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_segments"),
        F.count_if(F.col("_bp_is_boiler").isNotNull()).alias("n_removed"),
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """Sequence packing for pretraining batches — input columns plus
    ``shard, bin, bin_pos, n_tokens, straddles``.

    The cut-at-boundary model: documents are laid out in a deterministic
    md5 order into a continuous token stream per shard, and the stream
    is chopped every ``max_tokens`` tokens. ``bin`` is the chunk where
    the document STARTS, ``bin_pos`` its token offset there, and
    ``straddles`` flags documents crossing a boundary (the consumer
    splits or drops those — both standard policies).

    Scale posture: a global packing order would need a single-partition
    window; instead documents are hashed into ``num_shards`` independent
    streams and each shard packs under its own window partition — the
    same sharding a distributed loader consumes anyway (shard ->
    worker). Deterministic: order is ``md5(seed, id)``, so reruns,
    retries, and the DuckDB oracle reproduce the exact layout.
    """
    from graphframes_spark.datapipe.sampling import sample_rank

    toks = token_count(F.col(text_col)).cast("long")
    ranked = df.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        sample_rank(F.col(id_col), seed).alias("_rank"),
    ).withColumn(
        "shard",
        F.conv(F.substring(F.col("_rank"), 1, 12), 16, 10).cast("long")
        % F.lit(num_shards),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_rank", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return ranked.select(
        id_col,
        "shard",
        F.floor(start / F.lit(max_tokens)).alias("bin"),
        (start % F.lit(max_tokens)).alias("bin_pos"),
        "n_tokens",
        (
            (F.floor((cum - F.lit(1)) / F.lit(max_tokens)))
            > F.floor(start / F.lit(max_tokens))
        ).alias("straddles"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate n-token spans — the core signal of
    substring-level training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022: repeated
    >= 50-token substrings across a corpus; expressed here at n-gram
    granularity). DF[gram, n_docs, n_occurrences], one row per n-token
    gram appearing in at least ``min_docs`` distinct documents, with
    ``n_occurrences`` counting every occurrence (within-document repeats
    included).

    Plan: per-row gram expansion (pure column algebra at scan speed) →
    explode → two-level hash aggregate, first on (gram, doc) then on
    gram — both partial-aggregatable, so map-side combine collapses
    within-partition repeats before either shuffle and no
    ``countDistinct`` expansion ever materializes. The ``min_docs``
    filter runs inside the final aggregate (HAVING), so the full gram
    table is never persisted. At 100 TB this is the canonical
    shuffle-bound corpus scan; shard by gram hash (the groupBy key
    already is one) and raise ``n`` to shrink the collision space.
    Memory per row is O(tokens × n) for the expansion — chunk giant
    documents first (``chunk_documents``) if rows are unbounded.
    """
    grams = ngrams(tokenize(F.col(text_col)), n)
    per_doc = (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy("gram", id_col)
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_occ").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= F.lit(min_docs))
    )


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary table — DF[token, count, rank, frequency],
    ordered nowhere (rank is a column, not a sort): ``rank`` is the
    1-based dense position by descending count (ties broken by token for
    engine-stable output) and ``frequency`` the corpus-relative share.
    The input to Zipf diagnostics, vocab pruning, and tokenizer-training
    corpus studies.

    Plan: per-row tokenize (scan speed) → explode → one
    partial-aggregatable hash aggregate → a single window over the
    *vocabulary* table (orders of magnitude smaller than the corpus;
    the one global sort this op needs) + a 1-row total broadcast. At
    100 TB the explode+agg dominates and shuffles exactly the distinct
    vocabulary per partition after map-side combine; raise ``min_count``
    to cut the long hapax tail before the window.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= F.lit(min_count))
    )
    total = counts.agg(F.sum("count").alias("_total"))
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "count",
            "rank",
            (F.col("count") / F.col("_total")).alias("frequency"),
        )
    )


def dup_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicate-span coverage — DF[<id>, n_grams,
    n_dup_grams, dup_coverage]: how much of each document consists of
    n-token spans that also occur in at least ``min_docs - 1`` OTHER
    documents. The doc-level filter signal derived from
    :func:`duplicate_spans` (RefinedWeb/FineWeb-style: drop or down-
    weight documents whose coverage exceeds a threshold).

    A gram counts as duplicated for a document only when it appears in
    >= ``min_docs`` distinct documents — a gram repeated many times
    inside ONE document does not mark that document (within-doc
    repetition is :func:`repetition_stats`' job).

    Plan: the corpus-level gram table (two partial-aggregatable
    aggregates, HAVING-filtered to duplicated grams only) left-semi-ish
    joined back onto each document's distinct grams, then one doc-keyed
    count — three hash aggregates and one join, all on the gram hash
    key; the duplicated-gram table is typically orders of magnitude
    smaller than the corpus, so the join's build side stays compact.
    Documents shorter than ``n`` tokens report 0 grams, coverage 0.0.
    """
    grams = ngrams(tokenize(F.col(text_col)), n)
    doc_grams = df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("_occ"))
    dup_grams = (
        doc_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= F.lit(min_docs))
        .select("gram")
    )
    flagged = doc_grams.join(dup_grams, on="gram", how="left_semi")
    per_doc_dup = flagged.groupBy(id_col).agg(
        F.sum("_occ").alias("n_dup_grams")
    )
    totals = df.select(
        F.col(id_col), F.greatest(F.size(grams), F.lit(0)).alias("n_grams")
    )
    return (
        totals.join(per_doc_dup, on=id_col, how="left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_dup_grams"), F.lit(0)).alias("n_dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce(F.col("n_dup_grams"), F.lit(0)) / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_coverage"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Rewrite each document with its corpus-duplicated n-token spans
    removed — the actual dedup step of Lee et al. ACL 2022 (the
    detection signal is :func:`duplicate_spans`; the doc-level filter is
    :func:`dup_span_coverage`; this is the surgical variant that keeps
    the document and cuts only the repeated substrings).

    DF[<id>, text, n_tokens, n_removed]: every token position covered by
    at least one n-gram that appears in >= ``min_docs`` distinct
    documents is dropped; the survivors are re-joined with single
    spaces in original order. The rewritten text is therefore
    *normalized* (lower-cased, whitespace-collapsed) — same convention
    as the fingerprint/dedup family. Documents shorter than ``n``
    tokens pass through untouched (normalized), fully-covered documents
    come back as the empty string.

    Plan: gram-position expansion (posexplode, scan speed) → semi-join
    against the duplicated-gram table (hash join on the gram key — the
    same shuffle :func:`duplicate_spans` already pays) → covered
    positions via a bounded ``sequence`` explode (each hit covers
    exactly n positions) → anti-join on (doc, position) → one
    reassembly aggregate keyed on the doc id (collect + array_sort;
    state per doc is the surviving tokens — never larger than the
    input row). No window over the corpus, no per-row quadratic: every
    stage is a hash shuffle on (gram) or (doc, pos).
    """
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_t"))
    tok_pos = base.select(
        id_col, F.posexplode(F.col("_t")).alias("_pos", "_tok")
    )
    gram_pos = base.select(
        id_col, F.posexplode(ngrams(F.col("_t"), n)).alias("_gpos", "gram")
    )
    dup = duplicate_spans(df, id_col, text_col, n, min_docs).select("gram")
    covered = (
        gram_pos.join(dup, on="gram", how="left_semi")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_gpos"), F.col("_gpos") + F.lit(n - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    kept = tok_pos.join(covered, on=[id_col, "_pos"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    return (
        base.select(id_col, F.size("_t").alias("n_tokens"))
        .join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_text"), F.lit("")).alias("text"),
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Language-model quality scores from a corpus-self-trained bigram
    model — the CCNet-style perplexity filter signal without an external
    model: documents whose token transitions are unusual *for this
    corpus* (gibberish, boilerplate soup, wrong-language fragments)
    score low. DF[<id>, n_bigrams, avg_logp, perplexity] with
    ``avg_logp = mean ln P(w2|w1)`` under add-k smoothing
    ``P(w2|w1) = (C(w1 w2) + k) / (C(w1 ·) + k·V)`` (V = distinct
    successor vocabulary); documents shorter than 2 tokens report 0
    bigrams and NULL scores. The model includes each document's own
    counts (self-trained corpus statistic, not a held-out LM) — the
    standard trade for a zero-dependency filter.

    Plan: one bigram explode + two hash aggregates build the model
    (bigram counts, then first-token marginals — both
    partial-aggregatable), a 1-row V broadcast, one join from the
    per-doc bigram stream to the model keyed on the bigram, one per-doc
    aggregate. At 100 TB the model tables are vocabulary-sized, the
    big join is shuffle-keyed on the bigram string, and hot bigrams
    ("of the") are exactly what AQE skew-split handles; prune the model
    with a min-count threshold upstream if the hapax tail dominates.
    """
    grams = ngrams(tokenize(F.col(text_col)), 2)
    doc_bi = df.select(
        F.col(id_col), F.explode(grams).alias("_bg")
    ).withColumn("_w1", F.split(F.col("_bg"), " ").getItem(0))
    bi_counts = doc_bi.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c12"))
    uni_counts = doc_bi.groupBy("_w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = doc_bi.select(
        F.split(F.col("_bg"), " ").getItem(1).alias("_w2")
    ).agg(F.countDistinct("_w2").alias("_v"))

    scored = (
        doc_bi.join(bi_counts, on="_bg")
        .join(uni_counts, on="_w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("_c12") + F.lit(add_k))
                / (F.col("_c1") + F.lit(add_k) * F.col("_v"))
            ).alias("_logp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_logp").alias("avg_logp"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(F.col("avg_logp"), 9).alias("avg_logp"),
            F.round(F.exp(-F.col("avg_logp")), 6).alias("perplexity"),
        )
    )
