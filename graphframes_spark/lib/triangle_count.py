"""Exact per-vertex triangle counting.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/TriangleCount.scala:41-203):
canonicalize to an undirected simple graph (orient src<dst, dedup, drop
self-loops), build each vertex's neighbor set, then per canonical edge
count common neighbors via ``array_intersect`` of the two endpoint sets;
each endpoint of an edge accumulates that edge's common-neighbor count and
the per-vertex total is halved (each triangle is counted via its two
incident edges at each vertex).

Scale notes: the only wide ops are one groupBy(collect_set) and one
self-join of edges against the neighbor-set table — both AQE-managed
shuffles; no driver-side state. Neighbor sets of hub vertices are the
skew risk; AQE skew-join splits them at runtime.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

COUNT_ID = "count"


def triangle_count(graph: "GraphFrame") -> DataFrame:
    # canonical undirected simple edges: src < dst
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )

    # undirected adjacency sets
    nbrs = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(SRC).alias(ID), F.col(DST).alias("nbr")),
                    F.struct(F.col(DST).alias(ID), F.col(SRC).alias("nbr")),
                )
            ).alias("p")
        )
        .select("p.id", "p.nbr")
        .groupBy(ID)
        .agg(F.collect_set("nbr").alias("nbr_set"))
    )

    # per-edge common-neighbor count
    src_sets = nbrs.select(F.col(ID).alias(SRC), F.col("nbr_set").alias("src_set"))
    dst_sets = nbrs.select(F.col(ID).alias(DST), F.col("nbr_set").alias("dst_set"))
    edge_counts = (
        edges.join(src_sets, on=SRC)
        .join(dst_sets, on=DST)
        .select(
            F.col(SRC),
            F.col(DST),
            F.array_size(F.array_intersect("src_set", "dst_set")).alias("common"),
        )
    )

    # per-vertex: each endpoint accumulates; each triangle counted twice
    per_vertex = (
        edge_counts.select(
            F.explode(
                F.array(
                    F.struct(F.col(SRC).alias(ID), F.col("common")),
                    F.struct(F.col(DST).alias(ID), F.col("common")),
                )
            ).alias("p")
        )
        .select("p.id", "p.common")
        .groupBy(ID)
        .agg((F.floor(F.sum("common") / 2)).alias(COUNT_ID))
    )

    return (
        graph.vertices.join(per_vertex, on=ID, how="left_outer")
        .withColumn(COUNT_ID, F.coalesce(F.col(COUNT_ID), F.lit(0)).cast("long"))
        .select(COUNT_ID, *graph.vertices.columns)
    )
