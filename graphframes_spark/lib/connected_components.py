"""Connected components via alternating large-star / small-star contraction.

Implements the two-phase algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") following the reference's AQE variant
(/root/reference/core/src/main/scala/org/graphframes/lib/TwoPhase.scala:331-443):
plain shuffle joins with AQE left on to handle skew at runtime, eager
checkpoints every N iterations to cut lineage, convergence detected by a
stable Decimal(38,0) sum of min-neighbor assignments (a cheap aggregate
instead of DataFrame equality).

Scale notes: each iteration is two join+agg rounds over the shrinking
edge set; hub skew is handled by AQE skew-join; the surrogate-long-ID
mapping keeps shuffle keys to 8 bytes regardless of the user ID type.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.harness import IterationHarness
from graphframes_spark.indexing import has_integral_id_type, indexed_edges, indexed_vertices
from graphframes_spark.util import ATTR, DST, ID, LONG_DST, LONG_ID, LONG_SRC, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

COMPONENT = "component"
MIN_NBR = "min_nbr"


def _symmetrize(ee: DataFrame) -> DataFrame:
    return ee.select(
        F.explode(
            F.array(
                F.struct(F.col(SRC), F.col(DST)),
                F.struct(F.col(DST).alias(SRC), F.col(SRC).alias(DST)),
            )
        ).alias("_edge")
    ).select(F.col("_edge." + SRC).alias(SRC), F.col("_edge." + DST).alias(DST))


def _min_nbrs(ee: DataFrame) -> DataFrame:
    """(src, min_nbr) where min_nbr = min(N(src) ∪ {src})."""
    return (
        _symmetrize(ee)
        .groupBy(SRC)
        .agg(F.min(DST).alias(MIN_NBR))
        .withColumn(MIN_NBR, F.least(F.col(SRC), F.col(MIN_NBR)))
    )


def _min_nbr_sum(min_nbrs: DataFrame):
    return min_nbrs.select(
        F.sum(F.col(MIN_NBR).cast("decimal(38,0)"))
    ).first()[0]


def connected_components(
    graph: "GraphFrame",
    algorithm: str = "graphframes",
    checkpoint_interval: int = 2,
    broadcast_threshold: int = -1,
    use_labels_as_components: bool = False,
    max_iter: int = 100,
) -> DataFrame:
    """Component id per vertex (column ``component``: long, or the original
    ID type when ``use_labels_as_components`` on non-integral ids)."""
    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=checkpoint_interval)

    idx_v = indexed_vertices(graph.vertices)
    vv = idx_v.select(F.col(LONG_ID).alias(ID), F.col(ATTR))
    raw_e = indexed_edges(graph.edges, idx_v).select(
        F.col(LONG_SRC).alias(SRC), F.col(LONG_DST).alias(DST)
    )
    # orient src < dst, dedup, drop self-loops (TwoPhase.prepare)
    ee = (
        raw_e.filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )
    ee = harness.persist(ee)

    min_nbrs1 = harness.persist(_min_nbrs(ee))
    prev_sum = _min_nbr_sum(min_nbrs1)
    harness.rotate()  # ee, min_nbrs1 become "previous"; kept until round ends

    converged = prev_sum is None  # no edges at all
    for iteration in harness.iterations(max_iter):
        if converged:
            break
        # large-star: connect strictly-larger neighbors to the min neighbor
        ee = harness.persist(
            ee.join(min_nbrs1, on=SRC)
            .select(F.col(DST).alias(SRC), F.col(MIN_NBR).alias(DST))  # src > dst
            .distinct()
        )
        # small-star: min neighbor among smaller ones
        min_nbrs2 = harness.persist(
            ee.groupBy(SRC).agg(F.min(DST).alias(MIN_NBR))
        )
        new_ee = (
            ee.join(min_nbrs2, on=SRC)
            .select(F.col(MIN_NBR).alias(SRC), F.col(DST))
            .filter(F.col(SRC) != F.col(DST))
            .union(
                min_nbrs2.select(F.col(MIN_NBR).alias(SRC), F.col(SRC).alias(DST))
            )
            .distinct()
        )
        if checkpoint_interval > 0 and iteration % checkpoint_interval == 0:
            new_ee = harness.checkpoint(new_ee, eager=True)
        ee = harness.persist(new_ee)

        min_nbrs1 = harness.persist(_min_nbrs(ee))
        curr_sum = _min_nbr_sum(min_nbrs1)
        if curr_sum == prev_sum:
            converged = True
        prev_sum = curr_sum
        harness.rotate()

    # assign components: member (dst) -> root (src); roots map to themselves
    indexed_label = vv.join(ee, vv[ID] == ee[DST], "left_outer").select(
        vv[ATTR],
        F.when(ee[SRC].isNull(), vv[ID]).otherwise(ee[SRC]).alias(COMPONENT),
        vv[ATTR][ID].alias(ID),
    )

    if has_integral_id_type(graph.vertices) or not use_labels_as_components:
        out = indexed_label.select(F.col(ATTR + ".*"), F.col(COMPONENT))
    else:
        orig = indexed_label.groupBy(COMPONENT).agg(F.min(ID).alias("_orig_id"))
        out = indexed_label.join(orig, on=COMPONENT).select(
            F.col(ATTR + ".*"), F.col("_orig_id").alias(COMPONENT)
        )
    return harness.finish(out)
