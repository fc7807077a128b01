"""CDLP per-superstep profile at the 10x and 50x LDBC rungs (round-11
task #2 follow-up): the 10x->50x segment exponent reads ~1.02 on a QUIET
machine (747.9s, cotenant 0.07 cores — BENCH_ldbc_50x_r11.json), so the
at-linear segment is real and the question is WHERE the time goes: a
uniform per-superstep scale-up (throughput-bound everywhere — the
memory-hierarchy hypothesis) vs one superstep degrading (a skew/state
cliff).

Runs labelPropagation(maxIter=10) once per rung after one warmup pass,
capturing pregel.LAST_RUN_SUPERSTEP_SECONDS, and prints per-superstep
seconds plus the 50x/10x per-superstep ratios.

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_LDBC_MEM (default 100g).
Writes BENCH_cdlp_supersteps_r11.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_ldbc  # noqa: E402
from bench import LoadMonitor  # noqa: E402
from graphframes_spark import GraphFrame  # noqa: E402
from graphframes_spark import pregel as pregel_mod  # noqa: E402

SCALES = (10.0, 50.0)
CDLP_ITERS = 10


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_LDBC_MEM", "100g")
    spark = bench_ldbc.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    monitor = LoadMonitor(spark)

    work = tempfile.mkdtemp(prefix="cdlp_prof_")
    out: dict = {"metric": "cdlp_superstep_profile", "cpus": cpus, "rungs": {}}
    try:
        for scale in SCALES:
            d = f"{work}/s{int(scale)}"
            bench_ldbc.generate_graph(spark, d, scale)
            v = spark.read.parquet(f"{d}/vertices")
            e = spark.read.parquet(f"{d}/edges")
            g = GraphFrame(v, e)
            for it in range(2):  # pass 0 = warmup, pass 1 = profiled
                pregel_mod.LAST_RUN_SUPERSTEP_SECONDS.clear()
                tok = monitor.start()
                t0 = time.time()
                g.labelPropagation(maxIter=CDLP_ITERS).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = round(time.time() - t0, 1)
                ctx = monitor.finish(tok)
                steps = [
                    round(s, 2) for s in pregel_mod.LAST_RUN_SUPERSTEP_SECONDS
                ]
                print(
                    f"# scale {scale} pass{it}: {dt}s steps={steps} "
                    f"(load1 {ctx['load1']}, cotenant "
                    f"{ctx['cotenant_cores']})",
                    file=sys.stderr,
                )
            out["rungs"][f"{int(scale)}x"] = {
                "total_s": dt,
                "supersteps_s": steps,
                "load": ctx,
            }
        s10 = out["rungs"]["10x"]["supersteps_s"]
        s50 = out["rungs"]["50x"]["supersteps_s"]
        n = min(len(s10), len(s50))
        out["per_superstep_ratio_50x_over_10x"] = [
            round(s50[i] / s10[i], 2) if s10[i] > 0 else None for i in range(n)
        ]
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
