"""Per-operator scaling exponents from the 1x vs 10x LDBC-shape runs.

Reads BENCH_ldbc.json (1x wiki-Talk size) and BENCH_ldbc_10x.json and
prints, per operator, the scaling exponent
``alpha = log(t_10x / t_1x) / log(E_10x / E_1x)`` — alpha <= 1 means
at-most-linear scaling in edges (the 100 TB posture target), alpha > 1
gets root-caused. Uses the min over measured passes for each cell (the
sandbox's load spikes only ever ADD time, so min is the honest
low-noise estimator; see SCALE.md "Measurement protocol").

Usage: python tools/ldbc_scaling.py [one_x.json] [ten_x.json]
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    one_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ldbc.json"
    ten_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_ldbc_10x.json"
    with open(one_path) as f:
        one = json.load(f)
    with open(ten_path) as f:
        ten = json.load(f)

    e1 = one["graph"]["edges_distinct"]
    e10 = ten["graph"]["edges_distinct"]
    ratio_e = e10 / e1
    rows = {}
    for op in one["queries"]:
        if op not in ten["queries"]:
            continue
        t1 = min(one["passes"][op])
        t10 = min(ten["passes"][op])
        rows[op] = {
            "t_1x_min_sec": t1,
            "t_10x_min_sec": t10,
            "time_ratio": round(t10 / t1, 2),
            "scaling_exponent": round(math.log(t10 / t1) / math.log(ratio_e), 3),
        }
    print(
        json.dumps(
            {
                "edges_1x": e1,
                "edges_10x": e10,
                "edge_ratio": round(ratio_e, 2),
                "per_op": rows,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
