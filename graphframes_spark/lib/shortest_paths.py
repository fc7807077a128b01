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
    → first-touch filter vs. state           (left-anti join)

so per-row width is constant and every aggregate has a map-side combine.
Only newly-reached pairs propagate (the frontier discipline = the
reference's landmark-only initial actives + skip-inactive + early stop).

Distances are unit-weight hop counts, so a ``(id, landmark)`` pair first
reached at hop h is FINAL — no later hop can improve it. That makes the
per-hop state update a plain lineage-free ``unionByName`` of
already-checkpointed first-touch batches (keys unique by construction):
no full-state re-aggregation shuffle and no state checkpoint per hop,
one O(|state|) shuffle per hop total (the anti-join, which reuses the
candidate aggregation's (id, landmark) exchange on the probe side). The
final ``map_from_entries(collect_list(...))`` groups at most
|landmarks| entries per vertex — bounded, not degree-sized.
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
        # `state` contains the very checkpointed batch the candidate
        # lineage was derived from (frontier), so this anti-join is a
        # self-join on shared attribute ids; renaming the build side
        # mints fresh exprIds (an Alias always does), so the analyzer
        # never has to deduplicate anything
        seen = state.select(
            F.col(ID).alias("_seen_id"), F.col(LANDMARK).alias("_seen_lm")
        )
        improved = candidates.join(
            seen,
            (candidates[ID] == seen["_seen_id"])
            & (candidates[LANDMARK] == seen["_seen_lm"]),
            how="left_anti",
        )
        # eager checkpoint (not persist): the frontier chains superstep to
        # superstep, so an unbroken lineage grows one join+agg per hop and
        # blows up driver plan handling on long chains. The emptiness
        # probe rides the checkpoint's materialization job (Observation)
        # instead of a second isEmpty action per hop.
        from pyspark.sql import Observation

        from graphframes_spark.pregel import _observed_count

        obs = Observation()
        improved = improved.observe(obs, F.count(F.lit(1)).alias("cnt"))
        improved = harness.checkpoint(improved, eager=True)
        if _observed_count(obs, "cnt") == 0:
            break
        # first-touch finality: keys in `improved` are disjoint from
        # `state`, so the union stays (id, landmark)-unique with no
        # re-min and, because every batch is already checkpointed, the
        # union tree's plan depth grows by one cheap node per hop
        state = state.unionByName(improved)
        # consolidate periodically: an ever-wider union makes each hop's
        # analysis and anti-join scan O(hops), O(hops^2) over the loop
        if harness.iteration % 8 == 0:
            state = harness.checkpoint(state, eager=True)
        frontier = improved
        harness.rotate()

    result = state.groupBy(ID).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(LANDMARK), F.col(DIST))))
        ).alias(DISTANCE_ID)
    )
    # the seed batch is graph.vertices filtered then checkpointed, and
    # localCheckpoint keeps attribute ids — rename the result's id so
    # this join never pairs two leaves sharing the vertices' exprIds
    res = result.select(
        F.col(ID).alias("_sp_res_id"), F.col(DISTANCE_ID)
    )
    out = (
        graph.vertices.join(
            res, graph.vertices[ID] == res["_sp_res_id"], how="left_outer"
        )
        .drop("_sp_res_id")
        .withColumn(
            DISTANCE_ID,
            F.coalesce(F.col(DISTANCE_ID), F.create_map().cast(map_type)),
        )
    )
    return harness.finish(out)
