"""Landmark shortest paths (hop distances) as a frontier-relaxation loop.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/ShortestPaths.scala:131-253):
``distances: map<idType, int>`` per vertex holds the hop count to each
reachable landmark, measured *along* edge direction (distance from v to
the landmark following forward edges); undirected mode also relaxes the
reverse direction. Unreached landmarks are absent from the map.

Re-architected from the reference's map-state Pregel for scale: the
reference aggregates ``reduce(collect_list(map), ...)`` per vertex
(ShortestPaths.scala:183-185) — a hub with 10^7 in-neighbors
materializes a 10^7-element array of maps in one row. Here state is the
*normalized* relation ``(id, landmark, dist)``; each superstep is

    frontier ⋈ edges → (id, landmark, dist+1)
    → groupBy(id, landmark).min(dist)        (partial-aggregatable)
    → anti-improvement filter vs. state      (left join)

so per-row width is constant and every aggregate has a map-side combine.
Only improved pairs propagate (the frontier discipline = the reference's
landmark-only initial actives + skip-inactive + early stop). The final
``map_from_entries(collect_list(...))`` groups at most |landmarks|
entries per vertex — bounded, not degree-sized.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.harness import IterationHarness
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

DISTANCE_ID = "distances"
LANDMARK = "_landmark"
DIST = "_dist"


def shortest_paths(
    graph: "GraphFrame", landmarks: Sequence[Any], is_directed: bool = True
) -> DataFrame:
    if not landmarks:
        raise GraphFramesError("shortestPaths requires a non-empty landmark list")

    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=2)
    vertex_type = graph.vertices.schema[ID].dataType
    map_type = T.MapType(vertex_type, T.IntegerType())

    edges = graph.edges.select(SRC, DST)
    # a message travels landmark-ward against edge direction: frontier
    # vertex f improves u for every edge u -> f
    prop = edges.select(F.col(DST).alias("_from"), F.col(SRC).alias("_to"))
    if not is_directed:
        prop = prop.unionByName(
            edges.select(F.col(SRC).alias("_from"), F.col(DST).alias("_to"))
        )
    prop = harness.pin(prop.distinct().repartition(F.col("_from")))

    state = (
        graph.vertices.select(ID)
        .filter(F.col(ID).isin(list(landmarks)))
        .select(
            F.col(ID), F.col(ID).alias(LANDMARK), F.lit(0).cast("int").alias(DIST)
        )
    )
    state = harness.checkpoint(state, eager=True)
    frontier = state

    # hop count to a fixed landmark set converges within |V| supersteps;
    # the frontier empties long before on real graphs
    for _ in harness.iterations(2_000_000_000):
        candidates = (
            prop.join(frontier, prop["_from"] == frontier[ID])
            .select(
                F.col("_to").alias(ID),
                F.col(LANDMARK),
                (F.col(DIST) + F.lit(1)).alias(DIST),
            )
            .groupBy(ID, LANDMARK)
            .agg(F.min(DIST).alias(DIST))
        )
        old = state.select(
            F.col(ID), F.col(LANDMARK), F.col(DIST).alias("_old_dist")
        )
        improved = candidates.join(old, on=[ID, LANDMARK], how="left_outer").filter(
            F.col("_old_dist").isNull() | (F.col(DIST) < F.col("_old_dist"))
        ).select(ID, LANDMARK, DIST)
        # eager checkpoint (not persist): the frontier chains superstep to
        # superstep, so an unbroken lineage grows one join+agg per hop and
        # blows up driver plan handling on long chains
        improved = harness.checkpoint(improved, eager=True)
        if improved.isEmpty():
            break
        state = harness.checkpoint(
            state.unionByName(improved)
            .groupBy(ID, LANDMARK)
            .agg(F.min(DIST).alias(DIST)),
            eager=True,
        )
        frontier = improved
        harness.rotate()

    result = state.groupBy(ID).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(LANDMARK), F.col(DIST))))
        ).alias(DISTANCE_ID)
    )
    out = graph.vertices.join(result, on=ID, how="left_outer").withColumn(
        DISTANCE_ID,
        F.coalesce(F.col(DISTANCE_ID), F.create_map().cast(map_type)),
    )
    return harness.finish(out)
