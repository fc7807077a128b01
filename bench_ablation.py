"""Ablation benchmark: measures THIS repo's design choices as ratios that
can be put beside the reference's published relative claims.

The reference publishes no absolute sf0.1 numbers — only relative ones
(benchmarks/README + blog): AQE-mode connected components 5-8x over the
manual broadcast-join mode, the mode()-style CDLP aggregation far over
count-map folds (~70x vs stock GraphX CDLP), and 2-3x wins from persist
tuning of iterative state. Real LDBC Graphalytics data
(examples/LDBCUtils.scala:7-27) needs a network download this environment
does not have, so each claim is re-measured on the largest local graph —
the lineitem part->order bipartite (~600k edges at sf0.1) — with the
JMH protocol shape of LDBCBenchmarkSuite.scala:29-58 (1 warmup, 3
measured repeats, median, local[*], 2x-cores shuffle partitions, Kryo).

Pairs measured (A = this repo's default, B = the ablated baseline):
- cc_aqe_on / cc_aqe_off          — two-phase CC with AQE disabled.
- cc_manual / cc_manual_skew      — the TRUE manual broadcast/skew-join
  mode (TwoPhase.scala:160-173 semantics, implemented round 7): AQE
  off, per-key degree counts, driver-collected hub set, split
  broadcast-union-shuffle joins. cc_manual uses the reference's default
  threshold (1e6 — no hubs on this graph, measuring the mode's fixed
  overhead of two extra hub-collect actions per iteration);
  cc_manual_skew uses threshold 32 so real hub keys take the broadcast
  branch. Comparable against the blog's 5-8x AQE-over-manual claim.
- lpa_mode / lpa_count_window     — Pregel mode() aggregation vs the
  naive groupBy(id,label).count() + window-argmax design (materializes
  per-label counts through two extra shuffles, no map-side partial
  aggregation on hubs — the shape the reference's count-map fold has).
- pr_tol_cached / pr_tol_nocache  — iteration-harness caches on vs
  no-op'd for a VOTING-mode algorithm (pageRank(tol=...)), whose
  per-superstep convergence probes re-execute the pinned state;
  fixed-iteration Pregel intentionally runs cache-free (fused jobs +
  ReusedExchange), so the persist claim only applies to voting mode
  (round 7: the earlier lpa_cached pair used fixed-iteration LPA, which
  is cache-free by design — it measured noise, 0.82-4.4x across rounds).

Prints ONE JSON line to stdout; the driver records it as BENCH_ablation.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphframes_spark import GraphFrame  # noqa: E402
from graphframes_spark import harness as harness_mod  # noqa: E402

ORDER_OFFSET = 10_000_000
SRC, DST, ID = "src", "dst", "id"


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes_spark-ablation")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.maxPlanStringLength", str(4 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .getOrCreate()
    )


def lineitem_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias(SRC),
        (F.col("l_orderkey") + F.lit(ORDER_OFFSET)).alias(DST),
    )
    v = (
        li.select(F.col(SRC).alias(ID))
        .union(li.select(F.col(DST).alias(ID)))
        .distinct()
    )
    e = li.distinct()
    return GraphFrame(v.localCheckpoint(eager=True), e.localCheckpoint(eager=True))


def lpa_count_window(g: GraphFrame, max_iter: int) -> "F.DataFrame":
    """Naive CDLP: per superstep, materialize per-(vertex, label) counts
    with a full groupBy shuffle, then window-argmax (second shuffle+sort).
    Same semantics/tie-break as label_propagation; deliberately no
    partial-aggregatable combine — the ablation baseline."""
    labels = g.vertices.select(ID, F.col(ID).alias("label")).localCheckpoint(
        eager=True
    )
    edges = g.edges.localCheckpoint(eager=True)
    for it in range(1, max_iter + 1):
        msgs = edges.join(
            labels.select(F.col(ID).alias(SRC), F.col("label").alias("_sl")), on=SRC
        )
        counts = msgs.groupBy(F.col(DST).alias(ID), F.col("_sl").alias("label")).agg(
            F.count("*").alias("_cnt")
        )
        w = Window.partitionBy(ID).orderBy(F.desc("_cnt"), F.asc("label"))
        winners = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(ID, F.col("label").alias("_new"))
        )
        labels = labels.join(winners, on=ID, how="left").select(
            ID, F.coalesce(F.col("_new"), F.col("label")).alias("label")
        )
        if it % 2 == 0 or it == max_iter:
            labels = labels.localCheckpoint(eager=True)
    return labels


def timed(fn, warmup: int, repeats: int) -> float:
    for _ in range(warmup):
        fn()
    reps = []
    for _ in range(repeats):
        start = time.perf_counter()
        fn()
        reps.append(time.perf_counter() - start)
    reps.sort()
    mid = len(reps) // 2
    median = reps[mid] if len(reps) % 2 else (reps[mid - 1] + reps[mid]) / 2
    return round(median, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    warmup = int(os.environ.get("SPARK_GRAFT_WARMUP", "1"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    g = lineitem_graph(spark, sf_dir)
    n_edges = g.edges.count()

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}

    # --- connected components: AQE on (default) vs off
    def cc_run():
        sink(g.connectedComponents())

    results["cc_aqe_on"] = timed(cc_run, warmup, repeats)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results["cc_aqe_off"] = timed(cc_run, warmup, repeats)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # --- true manual broadcast/skew-join mode (reference default 1e6
    # threshold, then a threshold low enough to exercise the broadcast
    # branch on this graph's part-key hubs)
    def cc_manual_run():
        sink(g.connectedComponents(broadcastThreshold=1_000_000))

    def cc_manual_skew_run():
        sink(g.connectedComponents(broadcastThreshold=32))

    results["cc_manual"] = timed(cc_manual_run, warmup, repeats)
    results["cc_manual_skew"] = timed(cc_manual_skew_run, warmup, repeats)

    # --- CDLP: mode() Pregel (default) vs count+window naive design
    def lpa_mode_run():
        sink(g.labelPropagation(maxIter=3))

    def lpa_naive_run():
        sink(lpa_count_window(g, max_iter=3))

    results["lpa_mode"] = timed(lpa_mode_run, warmup, repeats)
    results["lpa_count_window"] = timed(lpa_naive_run, warmup, repeats)

    # --- cache policy in VOTING mode: harness caches on (default) vs
    # no-op'd (each per-superstep probe action then re-shuffles edges).
    # pageRank(tol=...) is the voting-mode representative — its
    # convergence probe per superstep re-executes pinned state when the
    # persist queue is disabled.
    def pr_tol_run():
        sink(g.pageRank(tol=0.005).vertices)

    results["pr_tol_cached"] = timed(pr_tol_run, warmup, repeats)
    orig_persist = harness_mod.IterationHarness.persist
    orig_pin = harness_mod.IterationHarness.pin
    harness_mod.IterationHarness.persist = lambda self, df: df  # type: ignore
    harness_mod.IterationHarness.pin = lambda self, df: df  # type: ignore
    try:
        results["pr_tol_nocache"] = timed(pr_tol_run, warmup, repeats)
    finally:
        harness_mod.IterationHarness.persist = orig_persist
        harness_mod.IterationHarness.pin = orig_pin

    ratios = {
        "cc_aqe_off_over_on": round(results["cc_aqe_off"] / results["cc_aqe_on"], 2),
        "cc_manual_over_aqe": round(results["cc_manual"] / results["cc_aqe_on"], 2),
        "cc_manual_skew_over_aqe": round(
            results["cc_manual_skew"] / results["cc_aqe_on"], 2
        ),
        "lpa_naive_over_mode": round(
            results["lpa_count_window"] / results["lpa_mode"], 2
        ),
        "pr_tol_nocache_over_cached": round(
            results["pr_tol_nocache"] / results["pr_tol_cached"], 2
        ),
    }
    print(
        json.dumps(
            {
                "metric": "ablation_ratios",
                "value": ratios["lpa_naive_over_mode"],
                "unit": "x",
                "graph_edges": n_edges,
                "queries": results,
                "ratios": ratios,
                "reference_claims": {
                    "cc_aqe_over_manual": "5-8x on LDBC graphs up to 8M v / 260M e (blog; measured here as cc_manual/cc_manual_skew vs cc_aqe_on on the local graph)",
                    "cdlp_vs_stock_graphx": "~70x (GraphX CDLP count-map; local baseline is the count+window design)",
                    "persist_tuning": "2-3x (applies to voting-mode iteration state; fixed-iteration Pregel runs cache-free by design here)",
                },
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
