"""HITS (hubs and authorities, Kleinberg 1999).

Beyond-reference: the reference library has no HITS operator (its
algorithm set is GraphX-derived), but the power-iteration shape is the
same family as pageRank and fits the same DataFrame recipe. Per
iteration (the classic normalized formulation):

    auth(v) = Σ_{u→v} hub(u)     then L2-normalize auth
    hub(u)  = Σ_{u→v} auth(v)    then L2-normalize hub

Scale posture: each iteration is two edge-state joins + two
partial-aggregatable sums keyed on vertex id; the L2 norm is a 1-row
aggregate broadcast back (no driver collect, no window). State per
vertex is two doubles — hub-degree never inflates a row. Lineage is cut
with an eager checkpoint per iteration, same policy as the other
fixed-iteration recipes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.harness import IterationHarness
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

HUB = "hub"
AUTHORITY = "authority"


def _l2_normalized(
    harness: IterationHarness, df: DataFrame, key_alias: str, out_col: str
) -> DataFrame:
    """(key, _raw) → (id, out_col = _raw / ||_raw||₂); zero norm → 0.

    ``df`` is persisted first: it feeds both the 1-row norm aggregate and
    the normalized projection, and without the persist the upstream
    join+agg would execute twice per iteration.

    The norm is collected to the driver (a bounded 1-row aggregate, the
    same cost class as Pregel's convergence probes) and re-embedded as a
    literal rather than attached via ``crossJoin(broadcast(agg))``. The
    broadcast variant was measured pathological (round 11): the
    BroadcastExchange subtree executes the SAME lazily-persisted ``df``
    pipeline as a separate job concurrently with the stage that scans it,
    so both race to populate the cache — per-stage metrics showed
    executor time ≫ CPU time (tasks blocked on block locks) and
    occasional 3-4× end-to-end outliers (6s → 20-35s at sf0.1). The
    driver action materializes the cache exactly once, sequentially, and
    the division by an identical double is bit-exact either way.
    """
    df = harness.persist(df)
    norm = df.agg(
        F.sqrt(F.sum(F.col("_raw") * F.col("_raw"))).alias("_n")
    ).first()[0]
    norm_val = float(norm) if norm is not None else 0.0
    normalized = (
        (F.col("_raw") / F.lit(norm_val)) if norm_val > 0 else F.lit(0.0)
    )
    return df.select(
        F.col(key_alias).alias(ID), normalized.alias(out_col)
    )


def hits(graph: "GraphFrame", max_iter: int = 10) -> DataFrame:
    """DF[<vertex columns>, hub: double, authority: double]."""
    if max_iter < 1:
        raise GraphFramesError("maxIter must be >= 1")
    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=1)
    edges = harness.pin(graph.edges.select(SRC, DST).distinct())

    hub = graph.vertices.select(ID).withColumn(HUB, F.lit(1.0))
    hub = harness.checkpoint(hub, eager=True)
    auth = None
    for _ in harness.iterations(max_iter):
        raw_a = (
            edges.join(hub.withColumnRenamed(ID, SRC), on=SRC)
            .groupBy(DST)
            .agg(F.sum(HUB).alias("_raw"))
        )
        auth = _l2_normalized(harness, raw_a, DST, AUTHORITY)
        raw_h = (
            edges.join(auth.withColumnRenamed(ID, DST), on=DST)
            .groupBy(SRC)
            .agg(F.sum(AUTHORITY).alias("_raw"))
        )
        hub = harness.checkpoint(
            _l2_normalized(harness, raw_h, SRC, HUB), eager=True
        )
        harness.rotate()
    auth = harness.checkpoint(auth, eager=True)

    out = (
        graph.vertices.join(hub, on=ID, how="left_outer")
        .join(auth, on=ID, how="left_outer")
        .withColumn(HUB, F.coalesce(F.col(HUB), F.lit(0.0)))
        .withColumn(AUTHORITY, F.coalesce(F.col(AUTHORITY), F.lit(0.0)))
    )
    return harness.finish(out)
