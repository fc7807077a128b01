"""Per-action wall-clock profiler for one queries() entry.

Monkeypatches the DataFrame action surface (count/first/collect/
localCheckpoint/checkpoint/isEmpty/noop-write) with timers that record the
caller's file:line, runs one query end-to-end (cold then warm), and prints
every action sorted by duration — the direct answer to "where do this
query's seconds go" that superstep traces only give for Pregel loops.

Usage: python tools/profile_actions.py <query> [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: sessions build the classic subclass, which overrides actions
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover
    from pyspark.sql import DataFrame

import bench


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = bench.build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    events: list[tuple[float, str, str]] = []

    def wrap(cls, meth):
        orig = getattr(cls, meth)

        def timed(self, *a, **kw):
            frames = [
                f
                for f in traceback.extract_stack()
                if "/graphframes_spark/" in f.filename
                or "__spark_entry__" in f.filename
            ]
            where = (
                f"{os.path.basename(frames[-1].filename)}:{frames[-1].lineno}"
                if frames
                else "?"
            )
            t0 = time.perf_counter()
            out = orig(self, *a, **kw)
            events.append((time.perf_counter() - t0, meth, where))
            return out

        setattr(cls, meth, timed)
        return orig

    saved = {
        m: wrap(DataFrame, m)
        for m in ("count", "first", "collect", "localCheckpoint", "checkpoint", "isEmpty")
    }

    import __spark_entry__ as entry

    for name in names:
        fn = entry.queries()[name]
        for rep in range(repeats):
            events.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_write = time.perf_counter() - t1
            total = time.perf_counter() - t0
            print(f"\n=== {name} rep {rep}: total {total:.2f}s "
                  f"(build+actions {t_build:.2f}s, final noop write {t_write:.2f}s)",
                  flush=True)
            acc = sum(e[0] for e in events)
            print(f"    {len(events)} intercepted actions, {acc:.2f}s accounted")
            for dur, meth, where in sorted(events, reverse=True)[:25]:
                print(f"    {dur:7.3f}s  {meth:16s} {where}")

    for m, orig in saved.items():
        setattr(DataFrame, m, orig)


if __name__ == "__main__":
    main()
