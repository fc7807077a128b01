"""Label propagation (community detection) on the DataFrame Pregel engine.

Semantics follow the reference DataFrame path
(/root/reference/core/src/main/scala/org/graphframes/lib/LabelPropagation.scala:85-146):
labels start as vertex ids; each superstep a vertex adopts the most
frequent label among incoming messages with a deterministic tie-break
(max count, then min label). Count maps are built by folding
``collect_list`` into a map via ``map_zip_with``.

Deviation from the reference: a vertex that receives no messages keeps
its current label (the reference nulls it); this matches GraphX CDLP and
keeps results total.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

LABEL_ID = "label"


def _key_with_max_value(m: Column) -> Column:
    """Key of the entry with the max value; ties broken by min key.

    ``array_min`` over ``struct(-count, key)`` sorts by count desc then key
    asc — works for any orderable key type (the reference's ``-1 * key``
    trick requires numeric keys)."""
    return F.array_min(
        F.transform(
            F.map_entries(m),
            lambda x: F.struct((-x["value"]).alias("neg"), x["key"].alias("key")),
        )
    )["key"]


def label_propagation(
    graph: "GraphFrame", max_iter: int = 5, is_directed: bool = True
) -> DataFrame:
    from graphframes_spark.graphframe import GraphFrame

    id_type = graph.vertices.schema[ID].dataType
    count_map_type = T.MapType(id_type, T.IntegerType())

    prepared = GraphFrame(graph.vertices.select(ID), graph.edges.select(SRC, DST))

    new_label = F.coalesce(_key_with_max_value(Pregel.msg()), F.col(LABEL_ID))

    pregel = (
        prepared.pregel.withVertexColumn(LABEL_ID, F.col(ID), new_label)
        .setMaxIter(max_iter)
        .setStopIfAllNonActiveVertices(True)
        .setUpdateActiveVertexExpression(F.col(LABEL_ID) != new_label)
        .requiredSrcColumns(LABEL_ID)
        .requiredDstColumns(LABEL_ID)
        .sendMsgToDst(Pregel.src(LABEL_ID))
    )
    if not is_directed:
        pregel = pregel.sendMsgToSrc(Pregel.dst(LABEL_ID))

    pregel = pregel.aggMsgs(
        F.aggregate(
            F.collect_list(Pregel.msg()),
            F.create_map().cast(count_map_type),
            lambda acc, x: F.map_zip_with(
                acc,
                F.create_map(x, F.lit(1)),
                lambda _, left, right: F.coalesce(left, F.lit(0))
                + F.coalesce(right, F.lit(0)),
            ),
        )
    )

    labels = pregel.run().select(ID, LABEL_ID)
    return graph.vertices.join(labels, on=ID, how="inner")
