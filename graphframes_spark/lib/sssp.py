"""Weighted single-source shortest paths (landmark Bellman-Ford).

The reference ships hop-count ``shortestPaths`` only, but documents
weighted SSSP as the canonical Pregel recipe (``Pregel.edge("weight")``,
/root/reference/docs/src/04-user-guide/10-pregel.md:46, early-stopping
note ibid.:106) and its LDBC validation surface includes Graphalytics
SSSP expected outputs (this repo's ldbc.py reads them with no algorithm
to check until now). Semantics: ``distances: map<idType, double>`` per
vertex = minimum total edge weight from the vertex to each reachable
landmark along edge direction (undirected mode also relaxes reverse);
unreachable landmarks are absent from the map.

Same normalized-state architecture as lib/shortest_paths.py — state is
the relation ``(id, landmark, dist)``, so per-row width is constant and
hubs never materialize degree-sized maps — but weighted relaxation
cannot use first-touch finality (a longer-hop path may be cheaper), so
each round keeps the classic Bellman-Ford improvement test:

    frontier ⋈ edges → (id, landmark, dist + weight)
    → groupBy(id, landmark).min(dist)          (partial-aggregatable)
    → improvement filter vs. state             (anti join: drop unless
                                                strictly cheaper than
                                                every prior relaxation)
    → state := plain union of checkpointed batches

State may hold superseded rows — one final ``groupBy.min`` drops them —
so the per-hop update is lineage-free and shuffle-free; the only
per-hop O(|state|) work is the anti-join's build side. Each key appears
at most once per hop that improves it (bounded by the hop length of its
shortest path under non-negative weights), so the superseded-row
overhead is a small constant factor on state size.

Rounds are bounded by ``max_iter`` (default 100): with non-negative
weights the loop self-terminates within the hop length of the longest
shortest path; negative edges are tolerated on DAGs, while a reachable
negative cycle has no defined answer — the cap turns that into a
bounded best-effort instead of an infinite loop.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Optional, Sequence

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
WEIGHT = "_weight"


def shortest_paths_weighted(
    graph: "GraphFrame",
    landmarks: Sequence[Any],
    weight_col: Optional[str] = "weight",
    is_directed: bool = True,
    max_iter: int = 100,
) -> DataFrame:
    """DF[<vertex columns>, distances: map<idType, double>].

    ``weight_col=None`` (or a column absent from the edges) falls back
    to unit weights — then this computes hop counts as doubles and the
    unweighted ``shortestPaths`` is the cheaper choice."""
    if not landmarks:
        raise GraphFramesError("shortestPathsWeighted requires a non-empty landmark list")
    if max_iter < 1:
        raise GraphFramesError("maxIter must be >= 1")

    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=1)
    vertex_type = graph.vertices.schema[ID].dataType
    map_type = T.MapType(vertex_type, T.DoubleType())

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None and weight_col in graph.edges.columns
        else F.lit(1.0)
    )
    edges = graph.edges.select(SRC, DST, w.alias(WEIGHT))
    # a message travels landmark-ward against edge direction: frontier
    # vertex f improves u by w(u -> f) for every edge u -> f
    prop = edges.select(
        F.col(DST).alias("_from"), F.col(SRC).alias("_to"), F.col(WEIGHT)
    )
    if not is_directed:
        prop = prop.unionByName(
            edges.select(
                F.col(SRC).alias("_from"), F.col(DST).alias("_to"), F.col(WEIGHT)
            )
        )
    # parallel edges: only the lightest can ever win a relaxation
    prop = harness.pin(
        prop.groupBy("_from", "_to")
        .agg(F.min(WEIGHT).alias(WEIGHT))
        .repartition(F.col("_from"))
    )

    state = (
        graph.vertices.select(ID)
        .filter(F.col(ID).isin(list(landmarks)))
        .select(
            F.col(ID), F.col(ID).alias(LANDMARK), F.lit(0.0).alias(DIST)
        )
    )
    state = harness.checkpoint(state, eager=True)
    frontier = state

    for _ in harness.iterations(max_iter):
        candidates = (
            prop.join(frontier, prop["_from"] == frontier[ID])
            .select(
                F.col("_to").alias(ID),
                F.col(LANDMARK),
                (F.col(DIST) + F.col(WEIGHT)).alias(DIST),
            )
            .groupBy(ID, LANDMARK)
            .agg(F.min(DIST).alias(DIST))
        )
        # anti-join with the inequality folded into the condition: a
        # candidate survives iff NO prior relaxation of its key was
        # already as cheap. `state` is allowed to hold superseded rows
        # (min deferred to the end), so the per-hop update is a
        # lineage-free union of checkpointed batches — no full-state
        # re-aggregation shuffle and no state checkpoint per hop.
        # Renamed build side mints fresh exprIds: `state` contains the
        # checkpointed batch the frontier lineage derives from (see
        # lib/shortest_paths.py for the analyzer-dedup trap).
        old = state.select(
            F.col(ID).alias("_old_id"),
            F.col(LANDMARK).alias("_old_lm"),
            F.col(DIST).alias("_old_dist"),
        )
        improved = candidates.join(
            old,
            (candidates[ID] == old["_old_id"])
            & (candidates[LANDMARK] == old["_old_lm"])
            & (old["_old_dist"] <= candidates[DIST]),
            how="left_anti",
        )
        # fold the emptiness probe into the checkpoint's materialization
        # job via Observation — no separate isEmpty action per hop
        from pyspark.sql import Observation

        from graphframes_spark.pregel import _observed_count

        obs = Observation()
        improved = improved.observe(obs, F.count(F.lit(1)).alias("cnt"))
        improved = harness.checkpoint(improved, eager=True)
        if _observed_count(obs, "cnt") == 0:
            break
        state = state.unionByName(improved)
        # consolidate periodically: an ever-wider union makes each hop's
        # analysis and anti-join scan O(hops), O(hops^2) over the loop
        if harness.iteration % 8 == 0:
            state = harness.checkpoint(state, eager=True)
        frontier = improved
        harness.rotate()

    # superseded rows dropped here: one min per (id, landmark) key
    result = (
        state.groupBy(ID, LANDMARK)
        .agg(F.min(DIST).alias(DIST))
        .groupBy(ID)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col(LANDMARK), F.col(DIST))))
            ).alias(DISTANCE_ID)
        )
    )
    res = result.select(F.col(ID).alias("_sp_res_id"), F.col(DISTANCE_ID))
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
