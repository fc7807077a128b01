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


def stream_edge_degrees(
    stream: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Windowed vertex degrees over an edge stream — the hot-vertex
    monitor for a continuously-ingesting graph (identity resolution,
    fraud): per event-time window and vertex, ``outDegree``/
    ``inDegree``/``degree`` of the edges that arrived in the window.

    One explode (each edge contributes its two endpoints, tagged) + one
    windowed hash aggregation keyed on (window, vertex) — state is one
    counter row per active (window, vertex), bounded by the watermark.
    Works identically on a batch edge DataFrame (the same plan minus the
    state store), so batch/stream parity is testable row-for-row.
    """
    ends = stream.withWatermark(ts_col, watermark_delay).select(
        F.col(ts_col),
        F.explode(
            F.array(
                F.struct(
                    F.col(src_col).alias("id"),
                    F.lit(1).alias("_o"),
                    F.lit(0).alias("_i"),
                ),
                F.struct(
                    F.col(dst_col).alias("id"),
                    F.lit(0).alias("_o"),
                    F.lit(1).alias("_i"),
                ),
            )
        ).alias("_end"),
    )
    return (
        ends.select(ts_col, "_end.id", "_end._o", "_end._i")
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("id"))
        .agg(
            F.sum("_o").alias("outDegree"),
            F.sum("_i").alias("inDegree"),
            F.count(F.lit(1)).alias("degree"),
        )
    )


def sessionize_batch(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization: split each user's event sequence wherever
    consecutive events are more than ``gap_seconds`` apart —
    DF[<user>, session_start, session_end, n_events].

    Window-function formulation (lag + running sum of gap-breaks): one
    shuffle on the user key, no per-row Python. This is the exact batch
    twin of ``stream_sessionize`` — identical output on the same events —
    and the oracle used to verify it."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # TIMESTAMP_NTZ cannot cast to long directly — go through TIMESTAMP
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    with_break = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.when(
            epoch - F.lag(epoch).over(w) > F.lit(gap_seconds),
            1,
        )
        .otherwise(0)
        .alias("_brk"),
    )
    with_sess = with_break.withColumn(
        "_sess", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sess.groupBy(user_col, "_sess").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("_sess")


def stream_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` — the Structured Streaming escape hatch
    for semantics the built-in windowed aggregations cannot express
    (session windows keyed by activity gaps, arbitrary per-key state).

    Per user, state holds the open session (start, last-seen, count).
    Sessions CLOSED inside a micro-batch (a new event arrives more than
    ``gap_seconds`` after the previous) are emitted immediately; the
    still-open session is emitted when the event-time watermark passes
    ``last + gap`` (EventTimeTimeout), so every session is emitted
    exactly once. State is one row per active user — the state store
    shards it by key and checkpoints it for recovery.

    Output schema matches ``sessionize_batch``.
    """
    import pandas as pd  # noqa: F401 (arrow batches arrive as pandas)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "start double, last double, n long"

    def _emit(pd, key, sessions):
        return pd.DataFrame(
            {
                user_col: [key[0]] * len(sessions),
                "session_start": pd.to_datetime([s[0] for s in sessions], unit="s"),
                "session_end": pd.to_datetime([s[1] for s in sessions], unit="s"),
                "n_events": [s[2] for s in sessions],
            }
        )

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        gap = float(gap_seconds)
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(pd, key, [(start, last, n)])
            return

        ts_values = []
        for pdf in pdf_iter:
            ts_values.extend(pdf[ts_col].astype("int64").to_numpy() / 1e9)
        ts_values.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts_values:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((float(start), float(last), int(n)))
        # close the open session once the event-time watermark passes it
        state.setTimeoutTimestamp(int((last + gap) * 1000) + 1)
        if closed:
            yield _emit(pd, key, closed)

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_contamination_flags(
    stream: DataFrame,
    reference: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    bloom=None,
) -> DataFrame:
    """Continuously flag incoming documents that share >= ``min_shared``
    distinct n-gram shingles with a *static* reference corpus (the
    benchmark set) — the streaming twin of
    :func:`graphframes_spark.datapipe.bloom.decontaminate`'s detection
    stage. Emits DF[<id>, ref_<ref_id>, n_shared] per contaminated
    (incoming, reference) pair; route it to the quarantine sink while
    the raw stream flows on.

    Plan: per-row shingle explode (stateless), optional broadcast Bloom
    prefilter (pass a prebuilt
    :class:`~graphframes_spark.datapipe.bloom.BloomFilter` built on the
    reference's shingles — at 100 TB/day this drops >99% of exploded
    shingles before the stream-static join), stream-static equi-join on
    the shingle key, then a per-(doc, ref) count aggregate. The count
    is exact within a micro-batch because every shingle of a document
    arrives in its single input row; no watermark state is needed
    beyond the aggregation itself. Batch parity: running this with an
    ``availableNow`` trigger equals the batch inverted-index join of
    ``ngram_overlap`` (tests/test_streaming.py asserts it).
    """
    from graphframes_spark.datapipe.bloom import attach_bloom, might_contain
    from graphframes_spark.datapipe.text import shingles, tokenize

    left = stream.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(tokenize(F.col(text_col)), n)).alias("_sh"),
    )
    if bloom is not None:
        left = attach_bloom(left, bloom).filter(
            might_contain(F.col("_bloom"), F.col("_sh"), bloom)
        ).drop("_bloom")
    ref_sh = reference.select(
        F.col(ref_id_col).alias("_ref_id"),
        F.explode(shingles(tokenize(F.col(ref_text_col)), n)).alias("_sh"),
    )
    out_ref = f"ref_{ref_id_col}"
    return (
        left.join(ref_sh, on="_sh")
        .filter(F.col("_id") != F.col("_ref_id"))
        .groupBy(
            F.col("_id").alias(id_col), F.col("_ref_id").alias(out_ref)
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_shared))
    )
