"""Interleaved A/B: round-11 louvain local-moving restructure vs the
round-10 legacy plan (the round-8 sssp/hits protocol).

One session, one warmup of each arm, then N paired reps strictly
alternated (A,B,A,B,...) so ambient load hits both arms equally; the
report is per-arm median plus the per-pair delta distribution and the
same load context bench.py captures (loadavg + co-tenant core split).

Usage: python tools/bench_louvain_ab.py [reps] (default 7)
Writes BENCH_louvain_ab_r11.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from bench import LoadMonitor, build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IMPL_KEY = "spark.graphframes_spark.louvain.impl"


def run_once(spark, impl: str, monitor: LoadMonitor) -> tuple[float, dict]:
    spark.conf.set(IMPL_KEY, impl)
    fn = entry_mod.queries()["louvain_copurchase"]
    tok = monitor.start()
    start = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dur = time.perf_counter() - start
    return dur, monitor.finish(tok)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    monitor = LoadMonitor(spark)

    for impl in ("v11", "legacy"):
        run_once(spark, impl, monitor)  # warmup, discarded

    a, b, ctx = [], [], []
    for i in range(reps):
        da, ca = run_once(spark, "v11", monitor)
        db, cb = run_once(spark, "legacy", monitor)
        a.append(da)
        b.append(db)
        ctx.extend([{"impl": "v11", **ca}, {"impl": "legacy", **cb}])
        print(
            f"# pair {i + 1}/{reps}: v11 {da:.2f}s legacy {db:.2f}s "
            f"(cotenant {ca['cotenant_cores']}/{cb['cotenant_cores']} cores)",
            file=sys.stderr,
        )

    med_a, med_b = statistics.median(a), statistics.median(b)
    deltas = [(db - da) / db for da, db in zip(a, b)]
    out = {
        "query": "louvain_copurchase",
        "sf_dir": SF_DIR,
        "reps": reps,
        "v11_median_s": round(med_a, 3),
        "legacy_median_s": round(med_b, 3),
        "median_improvement_pct": round(100 * (med_b - med_a) / med_b, 1),
        "per_pair_improvement_pct": [round(100 * d, 1) for d in deltas],
        "v11_samples": [round(x, 3) for x in a],
        "legacy_samples": [round(x, 3) for x in b],
        "load_context": ctx,
    }
    with open(os.path.join(REPO, "BENCH_louvain_ab_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "v11_median_s", "legacy_median_s", "median_improvement_pct")}))


if __name__ == "__main__":
    main()
