"""Deterministic negative-edge sampling (link-prediction / GNN training).

Beyond-reference: training a link predictor or GNN on positive edges
needs non-edges as negatives. The naive recipes don't scale or don't
replay: uniform `rand()` breaks under task retry, and "pick index
j = rand() % n" needs a contiguous global index (a driver-side
zipWithIndex or a single-partition window — both scale killers).

Bucketed hash-tournament design (every step partial-aggregatable,
engine-portable md5 arithmetic like the rest of this repo):

1. every vertex is hashed into one of B buckets (``md5(seed, id) % B``);
2. every (src, slot < k) proposal is hashed to a target bucket the same
   way, joined against that bucket's ~n/B members (bounded fan-out —
   the join is keyed on the bucket id, never all-pairs);
3. within the bucket the proposal takes the member minimizing
   ``md5(seed, src, slot, dst)`` — ``min(struct(hash, dst))``, one hash
   aggregation, deterministic tie-break;
4. self-loops and existing edges fall out via one anti-join.

The result is *up to* ``num_per_vertex`` distinct negatives per source
(collisions with real edges/self are dropped rather than re-drawn — the
standard training-data convention; raise ``num_per_vertex`` to
compensate). Sampling is uniform-ish over vertices (bucket sizes
concentrate around n/B) and bit-stable across reruns, retries, and
engines — the DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

#: join fan-out target: expected bucket size ~MEMBERS_PER_BUCKET members
_MEMBERS_PER_BUCKET = 16


def _h(*cols) -> "F.Column":
    """48-bit engine-portable hash of the ':'-joined inputs."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *cols)), 1, 12), 16, 10
    ).cast("long")


def sample_negative_edges(
    graph: "GraphFrame",
    num_per_vertex: int = 1,
    seed: str = "neg",
    num_buckets: Optional[int] = None,
) -> DataFrame:
    """DF[src, dst] — up to ``num_per_vertex`` deterministic non-edges
    per source vertex (see module docstring for the guarantees)."""
    if num_per_vertex < 1:
        raise GraphFramesError(
            f"numPerVertex must be >= 1, got {num_per_vertex}"
        )
    v = graph.vertices.select(ID)
    if num_buckets is None:
        n = v.count()
        num_buckets = max(1, n // _MEMBERS_PER_BUCKET)
    pool = v.select(
        F.col(ID).alias("_cand"),
        (_h(F.lit(seed), F.col(ID)) % F.lit(num_buckets)).alias("_b"),
    )
    props = v.select(
        F.col(ID).alias(SRC),
        F.explode(F.array(*[F.lit(i) for i in range(num_per_vertex)])).alias(
            "_slot"
        ),
    ).select(
        SRC,
        "_slot",
        (_h(F.lit(seed), F.col(SRC), F.col("_slot")) % F.lit(num_buckets)).alias(
            "_b"
        ),
    )
    picked = (
        props.join(pool, on="_b")
        .filter(F.col("_cand") != F.col(SRC))
        .groupBy(SRC, "_slot")
        .agg(
            F.min(
                F.struct(
                    _h(
                        F.lit(seed), F.col(SRC), F.col("_slot"), F.col("_cand")
                    ).alias("_r"),
                    F.col("_cand").alias("_c"),
                )
            ).alias("_best")
        )
        .select(SRC, F.col("_best._c").alias(DST))
        .distinct()
    )
    existing = graph.edges.select(SRC, DST).distinct()
    return picked.join(existing, on=[SRC, DST], how="left_anti")
