"""Betweenness 10x scale rung (round-11 task): the most expensive
non-laddered operator gets one measured scaling point under the LDBC
protocol shape.

Source-sampled Brandes (|S| = 8 fixed sources: the hub plus 7 spread
ids — the SAME sample size at both rungs, since the settled/DAG state
is |S|-proportional by design) on the bench_ldbc synthetic wiki-Talk-
shaped graph at scale 1 (2.39M v / 5.0M e) and scale 10 (24M v / 50M e),
max_depth=8, 1 warmup + N measured per rung, per-pass load context.

Prints ONE JSON line with per-rung times and the 1x->10x exponent
(alpha = log10(t10/t1)); run with
``python tools/bench_betweenness_rung.py [> BENCH_betweenness_10x.json]``.
Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BW_REPEATS (default 2),
SPARK_GRAFT_BW_MEM (default 64g).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench_ldbc  # noqa: E402
from bench import LoadMonitor  # noqa: E402
from graphframes_spark import GraphFrame  # noqa: E402

SCALES = (1.0, 10.0)
N_SOURCES = 8
MAX_DEPTH = 8


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BW_REPEATS", "2"))
    os.environ.setdefault("SPARK_GRAFT_LDBC_MEM", os.environ.get("SPARK_GRAFT_BW_MEM", "64g"))
    spark = bench_ldbc.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    monitor = LoadMonitor(spark)

    work = tempfile.mkdtemp(prefix="bw_rung_")
    out: dict = {"metric": "betweenness_10x_rung", "unit": "sec",
                 "n_sources": N_SOURCES, "max_depth": MAX_DEPTH,
                 "cpus": cpus, "rungs": {}}
    try:
        for scale in SCALES:
            d = f"{work}/s{int(scale)}"
            bench_ldbc.generate_graph(spark, d, scale)
            v = spark.read.parquet(f"{d}/vertices")
            e = spark.read.parquet(f"{d}/edges")
            g = GraphFrame(v, e)
            n_v = int(bench_ldbc.WIKI_TALK_V * scale)
            # hub (vertex 0) + 7 ids spread across the rank range —
            # deterministic, same |S| at both rungs
            sources = [0] + [int(n_v * frac) for frac in
                             (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9)]
            times, ctxs = [], []
            for it in range(1 + repeats):
                tok = monitor.start()
                t0 = time.time()
                g.betweennessCentrality(
                    sources, maxDepth=MAX_DEPTH
                ).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                ctx = monitor.finish(tok)
                if it > 0:
                    times.append(dt)
                    ctxs.append(ctx)
                print(
                    f"# scale {scale} pass{it}"
                    f"{' (warmup)' if it == 0 else ''}: {dt}s "
                    f"(load1 {ctx['load1']}, cotenant "
                    f"{ctx['cotenant_cores']})",
                    file=sys.stderr,
                )
            out["rungs"][f"{int(scale)}x"] = {
                "min_s": min(times), "passes": times, "load": ctxs,
                "vertices": n_v,
            }
        t1 = out["rungs"]["1x"]["min_s"]
        t10 = out["rungs"]["10x"]["min_s"]
        out["exponent_1x_10x"] = round(math.log10(t10 / t1), 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
