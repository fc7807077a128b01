"""Structured Streaming operators for the LLM-data-pipeline tier.

The reference engine is batch-only (SURVEY.md §2.7), so this module is
beyond-reference surface: the streaming shapes a continuously-ingesting
training-data pipeline needs, expressed on public Structured Streaming
primitives (``withWatermark`` + stateful dedup / windowed aggregation —
the state store handles distribution and recovery; no custom sinks).

All functions are stream-DataFrame-in / stream-DataFrame-out: callers
attach their own ``writeStream`` (files/Kafka/Delta). At 100 TB/day the
levers are the watermark delay (bounds state-store size), shuffle
partitions (state is hash-partitioned by key), and RocksDB state store
for large dedup windows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.datapipe.text import fingerprint, minhash_fingerprint, token_count


def stream_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream.

    Keyed on the normalized-text md5 fingerprint; ``dropDuplicates``
    keeps per-key state until the watermark passes, so the dedup window
    equals the watermark delay and state is bounded. First occurrence
    wins (arrival order within the micro-batch).
    """
    with_fp = stream.withColumn("_fp", fingerprint(F.col(text_col)))
    # dropDuplicatesWithinWatermark (not dropDuplicates): with a non-event-
    # time key, plain dropDuplicates never evicts state; the
    # within-watermark variant drops per-key state once the watermark
    # passes, keeping the state store bounded
    return (
        with_fp.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def stream_near_dup_candidates(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark_delay: str = "10 minutes",
    shingle_len: int = 3,
) -> DataFrame:
    """Drop near-duplicate *candidates* from a stream: documents sharing
    a 1-permutation MinHash (minimum shingle hash) within the watermark
    window. A coarser filter than batch MinHash-LSH — streaming state
    cannot hold full signature bands cheaply; run the batch pipeline
    (``minhash_lsh_dedup``) over the survivors for exact grouping.
    """
    with_fp = stream.withColumn(
        "_minfp", minhash_fingerprint(F.col(text_col), shingle_len)
    )
    return (
        with_fp.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_minfp"])
        .drop("_minfp")
    )


def stream_token_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Windowed ingest statistics: documents and token volume per event-
    time window (optionally per extra keys, e.g. source/lang). Watermark
    bounds late data and lets windows finalize (append mode works)."""
    keys = [F.window(F.col(ts_col), window_duration)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .withColumn("_n_tokens", token_count(F.col(text_col)))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_tokens").alias("n_tokens"),
            F.avg("_n_tokens").alias("avg_tokens_per_doc"),
        )
    )
