"""Surrogate long-ID indexing for non-integral vertex IDs.

Mirrors the reference recipe
(/root/reference/core/src/main/scala/org/graphframes/GraphFrame.scala:1008-1070):
integral IDs are cast to long directly; otherwise a stable surrogate is
generated with ``repartition(id).sortWithinPartitions(id)`` +
``monotonically_increasing_id()`` (the repartition+sort makes the
assignment deterministic for a given partition count), and edges are
joined against the id→surrogate mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.util import ATTR, DST, ID, LONG_DST, LONG_ID, LONG_SRC, SRC

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def has_integral_id_type(vertices: DataFrame) -> bool:
    return isinstance(vertices.schema[ID].dataType, _INTEGRAL_TYPES)


def indexed_vertices(vertices: DataFrame) -> DataFrame:
    """DF[new_id: long, attr: struct<original vertex columns>].

    For non-integral IDs the mapping is materialized eagerly (local
    checkpoint): ``monotonically_increasing_id`` depends on runtime
    partitioning, so re-evaluating the lineage in two plan subtrees (e.g.
    once for the vertex side, once inside an edge join) could otherwise
    assign different surrogates to the same vertex under AQE.
    """
    attr = F.struct(*[vertices[c] for c in vertices.columns]).alias(ATTR)
    if has_integral_id_type(vertices):
        return vertices.select(F.col(ID).cast("long").alias(LONG_ID), attr)
    return (
        vertices.repartition(F.col(ID))
        .sortWithinPartitions(ID)
        .select(F.monotonically_increasing_id().alias(LONG_ID), attr)
        .localCheckpoint(eager=True)
    )


def indexed_edges(edges: DataFrame, idx_vertices: DataFrame) -> DataFrame:
    """DF[new_src: long, new_dst: long, attr: struct<original edge columns>].

    Integral endpoint ids take the reference's direct-cast fast path
    (GraphFrame.scala:1053-1062): the surrogate "mapping" is just
    ``cast(id as long)``, so joining the edge list against it twice would
    spend two vertex-sized shuffle joins computing a cast. Non-integral
    ids keep the mapping joins.
    """
    attr = F.struct(*[edges[c] for c in edges.columns]).alias(ATTR)
    packed = edges.select(F.col(SRC), F.col(DST), attr)
    vertex_id_type = idx_vertices.schema[ATTR].dataType[ID].dataType
    if isinstance(vertex_id_type, _INTEGRAL_TYPES):
        return packed.select(
            F.col(SRC).cast("long").alias(LONG_SRC),
            F.col(DST).cast("long").alias(LONG_DST),
            F.col(ATTR),
        )
    if LONG_ID in idx_vertices.columns:
        mapping = idx_vertices.select(
            F.col(ATTR)[ID].alias(ID), F.col(LONG_ID)
        )
    else:  # pragma: no cover
        raise ValueError("idx_vertices must come from indexed_vertices()")
    src_map = mapping.select(F.col(ID).alias(SRC), F.col(LONG_ID).alias(LONG_SRC))
    dst_map = mapping.select(F.col(ID).alias(DST), F.col(LONG_ID).alias(LONG_DST))
    return (
        packed.join(src_map, on=SRC, how="inner")
        .join(dst_map, on=DST, how="inner")
        .select(LONG_SRC, LONG_DST, ATTR)
    )
