"""Per-operator scaling exponents from the LDBC-shape rung runs.

Reads two or more BENCH_ldbc*.json files (1x wiki-Talk size, 10x, 50x,
...) and prints, per operator and per adjacent rung pair, the scaling
exponent ``alpha = log(t_hi / t_lo) / log(E_hi / E_lo)`` plus the
overall first-to-last exponent — alpha <= 1 means at-most-linear
scaling in edges (the 100 TB posture target), alpha > 1 gets
root-caused. Uses the min over measured passes for each cell (the
sandbox's load spikes only ever ADD time, so min is the honest
low-noise estimator; see SCALE.md "Measurement protocol"). Operators
absent from a rung (subset runs, SPARK_GRAFT_LDBC_OPS) are skipped for
the pairs that lack them.

Usage: python tools/ldbc_scaling.py [one_x.json ten_x.json [fifty_x.json ...]]
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    paths = sys.argv[1:] or ["BENCH_ldbc.json", "BENCH_ldbc_10x.json"]
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))

    # order rungs by edge count, whatever order the files were passed in
    # (out-of-order inputs would otherwise yield negative/garbage alphas)
    runs.sort(key=lambda r: r[1]["graph"]["edges_distinct"])
    edges = [d["graph"]["edges_distinct"] for _, d in runs]
    for (p_lo, _), (p_hi, _), e_lo, e_hi in zip(runs, runs[1:], edges, edges[1:]):
        if e_lo == e_hi:
            raise SystemExit(
                f"rungs {p_lo} and {p_hi} have the same edges_distinct "
                f"({e_lo}); scaling exponents need distinct edge counts "
                "per rung — drop one of the files."
            )
    ops = sorted({op for _, d in runs for op in d["queries"]})
    per_op: dict[str, dict] = {}
    for op in ops:
        cells = []
        for (p, d), e in zip(runs, edges):
            if op in d.get("queries", {}):
                cells.append((e, min(d["passes"][op])))
        if len(cells) < 2:
            continue
        pairs = {}
        for (e_lo, t_lo), (e_hi, t_hi) in zip(cells, cells[1:]):
            key = f"{round(e_hi / e_lo, 1)}x_edges"
            pairs[key] = {
                "t_lo_min_sec": t_lo,
                "t_hi_min_sec": t_hi,
                "time_ratio": round(t_hi / t_lo, 2),
                "alpha": round(math.log(t_hi / t_lo) / math.log(e_hi / e_lo), 3),
            }
        (e0, t0), (eN, tN) = cells[0], cells[-1]
        per_op[op] = {
            "rungs": pairs,
            "overall_alpha": round(math.log(tN / t0) / math.log(eN / e0), 3),
        }
    print(
        json.dumps(
            {
                "files": [p for p, _ in runs],
                "edges_per_rung": edges,
                "per_op": per_op,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
