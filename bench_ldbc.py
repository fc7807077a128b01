"""LDBC-shaped benchmark: the reference's benchmarked operators at the
reference's published graph scale.

The reference's public numbers are measured on LDBC Graphalytics
wiki-Talk — 2.39M vertices / 5.02M directed edges, "XS" — with a JMH
protocol of 1 warmup + 3 measured AverageTime iterations over
ConnectedComponents / CDLP(10 iters) / ShortestPaths, parquet input,
Kryo, local checkpoints
(/root/reference/docs/src/01-about/03-benchmarks.md:17-23,
benchmarks/src/main/scala/org/graphframes/benchmarks/LDBCBenchmarkSuite.scala:29-160,
dev/run_doc_benchmarks.py:36-55). The real dataset needs a network
download this environment does not have
(graphframes_spark/ldbc.py:download_if_not_exists), so this harness
generates a deterministic scale-free directed graph with wiki-Talk's
vertex/edge counts (heavy-tailed endpoint sampling via
``floor(V · u³)`` over xxhash64-derived uniforms — max degree lands
within ~2x of wiki-Talk's ~100k hub), writes it to parquet once
outside timing, and runs the same three operators under the same
protocol shape.

Numbers are NOT comparable to the reference's GitHub-runner wall-clock
(different hardware, different data) — they are comparable to the
reference's published *relative* claims and they document that this
engine completes the reference's benchmark suite at the reference's
benchmark scale on a single node.

Prints ONE JSON line; run with
``python bench_ldbc.py [> BENCH_ldbc.json]``.
Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_LDBC_REPEATS (default
2 measured after 1 warmup), SPARK_GRAFT_LDBC_SCALE (default 1.0 —
multiple of wiki-Talk size: 0.02 for smoke runs, 10 for the scale-rung
run recorded in BENCH_ldbc_10x.json — 24M vertices / 50M edges; 50 for
the reference-validation-scale rung in BENCH_ldbc_50x.json — 120M
vertices / ~250M edges, matching the reference's published CC
validation scale), SPARK_GRAFT_LDBC_MEM (driver heap, default 48g —
use ~100g for the 50x rung), SPARK_GRAFT_LDBC_OPS (comma-separated
subset of wcc,cdlp,shortest_paths,pagerank; default all),
SPARK_GRAFT_LDBC_PR_CURVE=1 to also measure the fixed-iteration Pregel
checkpoint-interval curve (1/2/4) at this graph scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphframes_spark import GraphFrame  # noqa: E402

WIKI_TALK_V = 2_394_385
WIKI_TALK_E = 5_021_410
CDLP_ITERS = 10  # benchmarks/.../LDBCBenchmarkSuite.scala:137-147
OP_NAMES = ("wcc", "cdlp", "shortest_paths", "pagerank")


def build_session(cpus: int) -> SparkSession:
    mem = os.environ.get("SPARK_GRAFT_LDBC_MEM", "48g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes_spark-ldbc-bench")
        .config("spark.driver.memory", mem)
        # same status-store/GC hygiene as bench.py: without these the SQL
        # status store pins thousands of dead SQLPlanMetric arrays and
        # localCheckpoint blocks accumulate across the 12 op passes —
        # measured as bimodal pass times (CDLP 29s vs 292s in ONE suite)
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.maxPlanStringLength", str(4 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    # SPARK_GRAFT_LDBC_EXTRA_CONF="k=v;k=v" — ad-hoc conf overrides for
    # scale experiments (e.g. AQE skew-split thresholds at the 50x rung);
    # applied last so they win over the fixed defaults above
    extra = os.environ.get("SPARK_GRAFT_LDBC_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    return builder.getOrCreate()


def generate_graph(spark: SparkSession, out_dir: str, scale: float) -> None:
    """Deterministic wiki-Talk-shaped graph written to parquet.

    Endpoints are sampled with density ∝ rank^(-2/3) (u³ inverse
    transform): vertex 0 collects ~0.75% of all edge ends (~75k degree
    at full scale) — the hub skew the reference's CC/CDLP claims are
    about. Self-loops dropped, multi-edges deduped (Graphalytics graphs
    are simple)."""
    n_v = max(int(WIKI_TALK_V * scale), 100)
    n_e = max(int(WIKI_TALK_E * scale), 200)

    def endpoint(salt: int):
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(1_000_000_007))
            / F.lit(1_000_000_007.0)
        )
        return F.floor(F.lit(float(n_v)) * u * u * u).cast("long")

    edges = (
        spark.range(n_e)
        .select(endpoint(1).alias("src"), endpoint(2).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    vertices = spark.range(n_v).select(F.col("id"))
    edges.write.mode("overwrite").parquet(f"{out_dir}/edges")
    vertices.write.mode("overwrite").parquet(f"{out_dir}/vertices")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_LDBC_REPEATS", "2"))
    scale = float(os.environ.get("SPARK_GRAFT_LDBC_SCALE", "1.0"))
    # validate the op subset BEFORE paying for graph generation — a typo
    # would otherwise KeyError minutes into the run
    op_subset = os.environ.get("SPARK_GRAFT_LDBC_OPS")
    keep = None
    if op_subset:
        keep = [s.strip() for s in op_subset.split(",") if s.strip()]
        unknown = [k for k in keep if k not in OP_NAMES]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_LDBC_OPS: unknown operator(s) {unknown}; "
                f"valid names: {', '.join(OP_NAMES)}"
            )
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ldbc_bench_")
    try:
        generate_graph(spark, work, scale)
        v = spark.read.parquet(f"{work}/vertices")
        e = spark.read.parquet(f"{work}/edges")
        g = GraphFrame(v, e)
        n_edges = e.count()

        # landmark = the hub (vertex 0) — reaches/reached-by the bulk of
        # the graph, the hardest single-landmark BFS
        ops = {
            "wcc": lambda: g.connectedComponents(),
            "cdlp": lambda: g.labelPropagation(maxIter=CDLP_ITERS),
            "shortest_paths": lambda: g.shortestPaths(
                landmarks=[0], isDirected=False
            ),
            # round 8: PageRank joins the protocol (Graphalytics PR is part
            # of the reference's golden suite; 10 fixed iterations like the
            # reference's LDBC PR config)
            "pagerank": lambda: g.pageRank(
                resetProbability=0.15, maxIter=10
            ).vertices,
        }
        assert set(ops) == set(OP_NAMES), "OP_NAMES out of sync with ops dict"
        if keep is not None:
            ops = {name: ops[name] for name in keep}

        from bench import LoadMonitor

        monitor = LoadMonitor(spark)
        results: dict[str, list[float]] = {name: [] for name in ops}
        load_ctx: dict[str, list[dict]] = {name: [] for name in ops}
        for it in range(1 + repeats):  # first pass = warmup
            for name, fn in ops.items():
                tok = monitor.start()
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                ctx = monitor.finish(tok)
                if it > 0:
                    results[name].append(round(dt, 3))
                    load_ctx[name].append(ctx)
                print(
                    f"# {name} pass{it}{' (warmup)' if it == 0 else ''}: "
                    f"{dt:.1f}s (load1 {ctx['load1']}, cotenant "
                    f"{ctx['cotenant_cores']} cores)",
                    file=sys.stderr,
                )

        avg = {
            name: round(sum(ts) / len(ts), 3) for name, ts in results.items()
        }

        # Optional: checkpoint-interval curve for fixed-iteration Pregel
        # at THIS graph scale (SPARK_GRAFT_LDBC_PR_CURVE=1). One pass per
        # interval (each is minutes at 10x); built on Pregel directly so
        # the public pageRank API keeps its measured default cadence.
        pr_curve: dict[str, float] = {}
        if os.environ.get("SPARK_GRAFT_LDBC_PR_CURVE"):
            from pyspark.sql import functions as F2

            from graphframes_spark.lib import pagerank as pr_mod
            from graphframes_spark.pregel import Pregel

            prepared = pr_mod._prepared_graph(g)
            n = prepared.vertices.count()
            for interval in (1, 2, 4):
                new_rank = F2.lit(0.15 / n) + F2.lit(0.85) * F2.coalesce(
                    Pregel.msg(), F2.lit(0.0)
                )
                t0 = time.time()
                res = (
                    prepared.pregel.withVertexColumn(
                        "pagerank", F2.lit(1.0 / n), new_rank
                    )
                    .sendMsgToDst(
                        Pregel.src("pagerank") / Pregel.src(pr_mod._OUT_DEG)
                    )
                    .aggMsgs(F2.sum(Pregel.msg()))
                    .requiredSrcColumns("pagerank", pr_mod._OUT_DEG)
                    .setCheckpointInterval(interval)
                    .setMaxIter(10)
                    .run()
                )
                res.count()
                pr_curve[str(interval)] = round(time.time() - t0, 3)
                res.unpersist()
                print(
                    f"# pr_interval_{interval}: {pr_curve[str(interval)]}s",
                    file=sys.stderr,
                )
        print(
            json.dumps(
                {
                    "metric": "ldbc_wiki_talk_shape_avg",
                    "value": round(sum(avg.values()), 3),
                    "unit": "sec",
                    "queries": avg,
                    "passes": results,
                    "load_per_pass": load_ctx,
                    "graph": {
                        "vertices": int(WIKI_TALK_V * scale),
                        "edges_distinct": n_edges,
                        "shape": "synthetic scale-free (wiki-Talk size)",
                    },
                    "protocol": "JMH-shape: 1 warmup + "
                    f"{repeats} measured, noop sink, Kryo, AQE on",
                    "cdlp_iters": CDLP_ITERS,
                    "cpus": cpus,
                    "scale": scale,
                    **(
                        {"pagerank_interval_curve_sec": pr_curve}
                        if pr_curve
                        else {}
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
