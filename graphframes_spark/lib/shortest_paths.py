"""Landmark shortest paths (hop distances) on the DataFrame Pregel engine.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/ShortestPaths.scala:131-253):
vertex state ``distances: map<idType, int>`` holds the hop count to each
reachable landmark; per superstep each vertex pulls its out-neighbors'
distance maps (messages flow dst→src along forward edges, so distances
measure paths *to* landmarks following edge direction), incremented by 1
and merged with element-wise min. Only vertices whose map improved stay
active; the run stops when no vertex is active.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

DISTANCE_ID = "distances"


def shortest_paths(
    graph: "GraphFrame", landmarks: Sequence[Any], is_directed: bool = True
) -> DataFrame:
    from graphframes_spark.graphframe import GraphFrame

    if not landmarks:
        raise GraphFramesError("shortestPaths requires a non-empty landmark list")

    vertex_type = graph.vertices.schema[ID].dataType
    map_type = T.MapType(vertex_type, T.IntegerType())

    def init_distances(vertex_id: Column) -> Column:
        expr = F.when(
            vertex_id == F.lit(landmarks[0]), F.create_map(F.lit(landmarks[0]), F.lit(0))
        )
        for lm in landmarks[1:]:
            expr = expr.when(vertex_id == F.lit(lm), F.create_map(F.lit(lm), F.lit(0)))
        return expr

    def concat_maps(left: Column, right: Column) -> Column:
        return (
            F.when(left.isNull(), right)
            .when(right.isNull(), left)
            .otherwise(
                F.map_zip_with(
                    left,
                    right,
                    lambda _, lv, rv: F.when(lv.isNull() | (lv > rv), rv).otherwise(lv),
                )
            )
        )

    def increment(m: Column) -> Column:
        return F.transform_values(m, lambda _, d: d + F.lit(1))

    def improved(new_map: Column, old_map: Column) -> Column:
        return F.aggregate(
            F.map_values(
                F.map_zip_with(
                    new_map,
                    old_map,
                    lambda _, n, o: (n.isNotNull() & o.isNull()) | (n < o),
                )
            ),
            F.lit(False),
            lambda acc, x: acc | x,
        )

    src_dist = Pregel.src(DISTANCE_ID)
    dst_dist = Pregel.dst(DISTANCE_ID)

    prepared = GraphFrame(
        graph.vertices.select(ID), graph.edges.select(SRC, DST)
    )

    pregel = (
        prepared.pregel.setMaxIter(2_000_000_000)
        .withVertexColumn(
            DISTANCE_ID,
            F.when(
                F.col(ID).isin(list(landmarks)), init_distances(F.col(ID))
            ).otherwise(F.create_map().cast(map_type)),
            concat_maps(F.col(DISTANCE_ID), Pregel.msg()),
        )
        .sendMsgToSrc(
            F.when(
                improved(increment(dst_dist), src_dist), increment(dst_dist)
            )
        )
        .aggMsgs(
            F.aggregate(
                F.collect_list(Pregel.msg()),
                F.lit(None).cast(map_type),
                concat_maps,
            )
        )
        .setEarlyStopping(True)
        .setInitialActiveVertexExpression(F.col(ID).isin(list(landmarks)))
        .setUpdateActiveVertexExpression(
            improved(Pregel.msg(), F.col(DISTANCE_ID))
        )
        .setStopIfAllNonActiveVertices(True)
        .setSkipMessagesFromNonActiveVertices(True)
        .requiredSrcColumns(DISTANCE_ID)
        .requiredDstColumns(DISTANCE_ID)
    )

    if not is_directed:
        pregel = pregel.sendMsgToDst(
            F.when(improved(increment(src_dist), dst_dist), increment(src_dist))
        )

    result = pregel.run()
    return graph.vertices.join(result.select(ID, DISTANCE_ID), on=ID, how="inner")
