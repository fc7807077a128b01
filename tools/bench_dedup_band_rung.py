"""At-scale A/B for the dedup band-join shape (dedup.bandJoin).

At sf0.1 the exploded band table broadcasts, so the knob's target
behavior — the double build+shuffle of the band self-join past the
broadcast threshold — never fires there. This harness reruns the A/B at
a corpus size where it does: bench_dp_scale.py's synthetic corpus at
N docs (default 2M — the round-11 scale-rung base), minhash_lsh_dedup
only, strict A/B interleaving, bench.py's load context per sample.

Usage: python tools/bench_dedup_band_rung.py [out.json]
Env: SPARK_GRAFT_CPUS (32), DEDUP_RUNG_DOCS (2000000), DEDUP_RUNG_PAIRS (3),
DEDUP_RUNG_KEY (dedup knob suffix, default bandJoin),
DEDUP_RUNG_ARMS ("candidate,baseline", default "partitioned,auto").
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench_dp_scale as dps  # noqa: E402
from bench import LoadMonitor  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("DEDUP_RUNG_DOCS", "2000000"))
    pairs = int(os.environ.get("DEDUP_RUNG_PAIRS", "3"))
    key = "dedup." + os.environ.get("DEDUP_RUNG_KEY", "bandJoin")
    arm_a, arm_b = os.environ.get("DEDUP_RUNG_ARMS", "partitioned,auto").split(",")

    spark = dps.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from graphframes_spark.datapipe.dedup import minhash_lsh_dedup

    work = tempfile.mkdtemp(prefix="dedup_band_rung_")
    dps.generate_corpus(spark, f"{work}/corpus", n_docs)
    docs = spark.read.parquet(f"{work}/corpus")
    monitor = LoadMonitor(spark)

    def run_once(val: str):
        spark.conf.set("spark.graphframes_spark." + key, val)
        spark.sparkContext.setJobDescription(f"band_rung:{val}")
        tok = monitor.start()
        t0 = time.perf_counter()
        minhash_lsh_dedup(docs, id_col="doc_id", text_col="text").write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0, monitor.finish(tok)

    for val in (arm_a, arm_b):
        dt, _ = run_once(val)
        print(f"# warmup {val}: {dt:.1f}s", file=sys.stderr)

    samples = {arm_a: [], arm_b: []}
    loads = []
    for i in range(pairs):
        for val in (arm_a, arm_b):
            dt, ld = run_once(val)
            samples[val].append(round(dt, 3))
            loads.append({"arm": val, **ld})
            print(f"# pair {i} {val}: {dt:.1f}s (steal {ld['steal_cores']})", file=sys.stderr)

    med_a = statistics.median(samples[arm_a])
    med_b = statistics.median(samples[arm_b])
    report = {
        "op": "minhash_lsh_dedup",
        "n_docs": n_docs,
        "conf_key": "spark.graphframes_spark." + key,
        "arm_a": arm_a,
        "arm_b": arm_b,
        "a_median_s": round(med_a, 3),
        "b_median_s": round(med_b, 3),
        "median_improvement_pct": round(100.0 * (med_b - med_a) / med_b, 1),
        "per_pair_improvement_pct": [
            round(100.0 * (b - a) / b, 1)
            for a, b in zip(samples[arm_a], samples[arm_b])
        ],
        "samples": samples,
        "load_context": loads,
        "cpus": cpus,
    }
    print(json.dumps(report))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
