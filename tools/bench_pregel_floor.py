"""A/B harness for the Pregel per-checkpoint planning floor.

Runs q_pagerank-shaped PageRank (customer-order graph, maxIter 10) at a
given SF, several repeats, reporting wall time plus the per-superstep
split captured by pregel.LAST_RUN_SUPERSTEP_SECONDS. Interval is
parameterized so the checkpoint-cadence curve can be measured.

Usage: python tools/bench_pregel_floor.py [sf_dir] [interval ...]
Env: FLOOR_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from graphframes_spark import GraphFrame  # noqa: E402
from graphframes_spark import pregel as pregel_mod  # noqa: E402
from graphframes_spark.lib import pagerank as pr_mod  # noqa: E402
from graphframes_spark.pregel import Pregel  # noqa: E402


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pregel-floor-bench")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


ORDER_OFFSET = 10_000_000  # same as __spark_entry__._customer_order_graph


def customer_order_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    """Same graph as q_pagerank (__spark_entry__._customer_order_graph)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        orders.select((F.col("o_orderkey") + ORDER_OFFSET).alias("id"))
    )
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        F.col("o_totalprice"),
    )
    return GraphFrame(v, e)


def pagerank_once(spark, sf_dir: str, interval: int) -> tuple[float, list[float]]:
    g = customer_order_graph(spark, sf_dir)

    prepared = pr_mod._prepared_graph(g)
    n = prepared.vertices.count()
    init = F.lit(1.0 / n)
    reset = F.lit(0.15 / n)
    new_rank = reset + F.lit(0.85) * F.coalesce(Pregel.msg(), F.lit(0.0))
    t0 = time.perf_counter()
    res = (
        prepared.pregel.withVertexColumn("pagerank", init, new_rank)
        .sendMsgToDst(Pregel.src("pagerank") / Pregel.src(pr_mod._OUT_DEG))
        .aggMsgs(F.sum(Pregel.msg()))
        .requiredSrcColumns("pagerank", pr_mod._OUT_DEG)
        .setCheckpointInterval(interval)
        .setMaxIter(10)
        .run()
    )
    res.count()
    dt = time.perf_counter() - t0
    steps = list(pregel_mod.LAST_RUN_SUPERSTEP_SECONDS)
    res.unpersist()
    return dt, steps


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    intervals = [int(a) for a in sys.argv[2:]] or [1, 2, 5, 10]
    repeats = int(os.environ.get("FLOOR_REPEATS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("FLOOR_NO_CONSTRAINT_PROP"):
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    out: dict[str, dict] = {}
    # warmup (JIT, parquet footer cache)
    pagerank_once(spark, sf_dir, 5)
    # interleave repeats round-robin (SCALE.md measurement protocol)
    times: dict[int, list[float]] = {i: [] for i in intervals}
    steps_by_int: dict[int, list[float]] = {}
    for _ in range(repeats):
        for iv in intervals:
            dt, steps = pagerank_once(spark, sf_dir, iv)
            times[iv].append(dt)
            steps_by_int[iv] = steps
    for iv in intervals:
        ts = sorted(times[iv])
        out[str(iv)] = {
            "median_sec": round(ts[len(ts) // 2], 3),
            "min_sec": round(ts[0], 3),
            "max_sec": round(ts[-1], 3),
            "last_run_superstep_sec": [round(s, 3) for s in steps_by_int[iv]],
        }
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "intervals": out}))
    spark.stop()


if __name__ == "__main__":
    main()
