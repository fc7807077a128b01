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
