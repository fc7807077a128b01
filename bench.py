"""Benchmark harness: times the headline queries at a given scale factor.

Protocol mirrors the reference's JMH shape
(/root/reference/benchmarks/.../LDBCBenchmarkSuite.scala:29-58): warmup
pass + N measured repeats averaged, noop sink, AQE on, local checkpoints,
shuffle partitions sized to cores.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_WARMUP (default 1),
SPARK_GRAFT_REPEATS (default 3).

Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import __spark_entry__ as entry_mod

HEADLINE = [
    # round-1 set (kept stable for round-over-round comparison)
    "degrees",
    "motif_two_hop",
    "motif_negation",
    "motif_var_length",
    "triangle_count",
    "connected_components",
    "shortest_paths",
    "label_propagation",
    "pagerank",
    "aggregate_messages",
    "bfs",
    # round-2 graph tier
    "kcore",
    "scc",
    "cycles",
    "ppr",
    "pg_projection",
    "pg_copurchase",
    # round-2 LLM-data-pipeline tier
    "dp_token_counts",
    "dp_quality",
    "dp_minhash_dedup",
    "dp_simhash_pairs",
    "dp_ann_topk",
]


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes_spark-bench")
        # local mode runs all executor threads inside the driver JVM; the
        # 1g default heap OOMs at sf0.1 (plan-string rendering alone can
        # exhaust it on deep iterative plans)
        .config("spark.driver.memory", "32g")
        .config("spark.sql.maxPlanStringLength", str(4 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def run_query(spark: SparkSession, name: str, sf_dir: str) -> float:
    fn = entry_mod.queries()[name]
    start = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    warmup = int(os.environ.get("SPARK_GRAFT_WARMUP", "1"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    names = sys.argv[1:] or HEADLINE

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from graphframes_spark import pregel as pregel_mod

    timings: dict[str, float] = {}
    supersteps: dict[str, list[float]] = {}
    for name in names:
        for _ in range(warmup):
            run_query(spark, name, sf_dir)
        reps = []
        for _ in range(repeats):
            pregel_mod.LAST_RUN_SUPERSTEP_SECONDS.clear()
            reps.append(run_query(spark, name, sf_dir))
        timings[name] = round(sum(reps) / len(reps), 3)
        if pregel_mod.LAST_RUN_SUPERSTEP_SECONDS:
            supersteps[name] = [
                round(s, 3) for s in pregel_mod.LAST_RUN_SUPERSTEP_SECONDS
            ]
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "supersteps": supersteps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
