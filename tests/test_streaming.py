"""Structured Streaming datapipe tests: file-source micro-batches with
availableNow triggers into memory sinks."""

import json
import time

import pytest
from pyspark.sql import functions as F

from graphframes_spark.datapipe.streaming import (
    stream_exact_dedup,
    stream_near_dup_candidates,
    stream_token_stats,
)

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_docs(path, rows):
    with open(f"{path}/docs.json", "w") as f:
        for doc_id, ts, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def doc_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(
        str(src),
        [
            (1, "2026-01-01T00:00:00", "the quick brown fox"),
            (2, "2026-01-01T00:00:10", "THE  Quick   Brown FOX"),  # exact dup (normalized)
            (3, "2026-01-01T00:00:20", "completely different text here"),
            (4, "2026-01-01T00:01:30", "the quick brown cat"),
        ],
    )
    return spark.readStream.schema(SCHEMA).json(str(src))


def test_stream_exact_dedup(spark, doc_stream):
    out = stream_exact_dedup(doc_stream)
    _run_to_memory(out, "dedup_sink")
    ids = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM dedup_sink").collect())
    # doc 2 is an exact dup of 1 after normalization; 4 differs in last token
    assert ids == [1, 3, 4]


def test_stream_near_dup_candidates(spark, doc_stream):
    out = stream_near_dup_candidates(doc_stream)
    _run_to_memory(out, "neardup_sink")
    ids = {r["doc_id"] for r in spark.sql("SELECT * FROM neardup_sink").collect()}
    assert 1 in ids and 3 in ids and 2 not in ids


def test_stream_token_stats(spark, doc_stream):
    out = stream_token_stats(doc_stream, window_duration="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("stats_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stats_sink").collect()
    by_window = {r["window"]["start"].minute: r for r in rows}
    assert by_window[0]["n_docs"] == 3
    assert by_window[1]["n_docs"] == 1
    assert by_window[0]["n_tokens"] == 12


EVENT_SCHEMA = "event_id long, ts timestamp, user_id long"


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from graphframes_spark.datapipe.streaming import sessionize_batch, stream_sessionize

    src = tmp_path / "events"
    src.mkdir()
    rows = [
        # user 1: two sessions separated by > 30 min
        (1, "2026-01-01T00:00:00", 1),
        (2, "2026-01-01T00:05:00", 1),
        (3, "2026-01-01T01:00:00", 1),
        # user 2: one session only (stays open -> not emitted in batch 1)
        (4, "2026-01-01T00:00:30", 2),
        (5, "2026-01-01T00:10:00", 2),
    ]
    with open(src / "events.json", "w") as f:
        for eid, ts, uid in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid}) + "\n")
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    out = stream_sessionize(stream, gap_seconds=1800)
    _run_to_memory(out, "sess_sink")
    got = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM sess_sink").collect()
    }
    # user 1's first session closes in-batch (events 1+2); user 2's closes
    # via EventTimeTimeout once the watermark (max ts - 10 min = 00:50)
    # passes its last+gap (00:40). User 1's second session stays open
    # (timeout 01:30 is beyond the watermark) and is not emitted.
    assert (1, 2) in got and (2, 2) in got and len(got) == 2

    # batch twin agrees on the closed session
    batch = sessionize_batch(
        spark.createDataFrame(
            [(eid, ts.replace("T", " "), uid) for eid, ts, uid in rows],
            "event_id long, ts string, user_id long",
        ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"),
        gap_seconds=1800,
    )
    brow = [r for r in batch.collect() if r["user_id"] == 1 and r["n_events"] == 2][0]
    assert (brow["session_start"], brow["session_end"]) == got[(1, 2)]


def test_sessionize_batch_on_events_table(spark):
    from graphframes_spark.datapipe.streaming import sessionize_batch

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sessionize_batch(events, gap_seconds=3600)
    agg = out.groupBy("user_id").agg(
        F.sum("n_events").alias("total"), F.count("*").alias("n_sessions")
    )
    per_user = events.groupBy("user_id").count()
    joined = agg.join(per_user, "user_id")
    # session event counts partition each user's events exactly
    assert joined.filter(F.col("total") != F.col("count")).count() == 0
    assert out.filter(F.col("session_end") < F.col("session_start")).count() == 0


EDGE_SCHEMA = "src long, dst long, ts timestamp"


def test_stream_edge_degrees_matches_batch(spark, tmp_path):
    from graphframes_spark.datapipe.streaming import stream_edge_degrees

    src = tmp_path / "edges"
    src.mkdir()
    rows = [
        (1, 2, "2026-01-01T00:00:00"),
        (1, 3, "2026-01-01T00:00:10"),
        (3, 1, "2026-01-01T00:00:20"),
        (2, 3, "2026-01-01T00:01:30"),  # second window
    ]
    with open(src / "edges.json", "w") as f:
        for s, d, ts in rows:
            f.write(json.dumps({"src": s, "dst": d, "ts": ts}) + "\n")

    stream = spark.readStream.schema(EDGE_SCHEMA).json(str(src))
    q = (
        stream_edge_degrees(stream, window_duration="1 minute")
        .writeStream.format("memory")
        .queryName("deg_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].minute, r["id"]): (
            r["outDegree"],
            r["inDegree"],
            r["degree"],
        )
        for r in spark.sql("SELECT * FROM deg_sink").collect()
    }
    assert got[(0, 1)] == (2, 1, 3)
    assert got[(0, 3)] == (1, 1, 2)
    assert got[(0, 2)] == (0, 1, 1)
    assert got[(1, 2)] == (1, 0, 1)
    assert got[(1, 3)] == (0, 1, 1)

    # batch twin: identical plan on the static frame, identical rows
    batch = spark.read.schema(EDGE_SCHEMA).json(str(src))
    batch_rows = {
        (r["window"]["start"].minute, r["id"]): (
            r["outDegree"],
            r["inDegree"],
            r["degree"],
        )
        for r in stream_edge_degrees(batch, window_duration="1 minute").collect()
    }
    assert batch_rows == got


def test_stream_contamination_flags_matches_batch(spark, tmp_path):
    from graphframes_spark.datapipe.bloom import build_bloom
    from graphframes_spark.datapipe.streaming import stream_contamination_flags
    from graphframes_spark.datapipe.text import ngram_overlap, shingles, tokenize

    src = tmp_path / "contam_src"
    src.mkdir()
    rows = [
        (1, "2026-01-01T00:00:00", "the quick brown fox jumps over the lazy dog"),
        (2, "2026-01-01T00:00:10", "the quick brown fox jumps over the lazy cat"),
        (3, "2026-01-01T00:00:20", "completely different text with no overlap at all"),
    ]
    _write_docs(str(src), rows)
    reference = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    ref_sh = reference.select(
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("_sh")
    ).distinct()
    bloom = build_bloom(ref_sh, "_sh", num_bits=1 << 12, num_hashes=3)

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = stream_contamination_flags(
        stream, reference, n=3, min_shared=2, bloom=bloom
    )
    q = (
        out.writeStream.format("memory")
        .queryName("contam_sink")
        .outputMode("complete")  # stream-side aggregation, bounded keys
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["ref_doc_id"], r["n_shared"])
        for r in spark.sql("SELECT * FROM contam_sink").collect()
    }
    batch = spark.createDataFrame(
        [(i, t) for i, _, t in rows], ["doc_id", "text"]
    )
    expect = {
        (r["doc_id"], r["ref_doc_id"], r["n_shared"])
        for r in ngram_overlap(
            batch, reference, n=3, min_shared=2, ref_id_col="doc_id"
        ).collect()
    }
    assert got == expect and got  # parity, and non-empty (docs 1 and 2 hit)
