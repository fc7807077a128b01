"""K-core decomposition on the DataFrame Pregel engine.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/KCore.scala:37-108)
implementing Mandal & Al Hasan, "A distributed k-core decomposition
algorithm on Spark" (IEEE Big Data 2017): each vertex starts with its
degree as a core estimate; per superstep it broadcasts the estimate to
all neighbors and lowers its own to the largest ``l`` such that at least
``l`` neighbors have estimate ``>= l`` (an h-index over the neighbor
estimates capped at its own).

The reference's custom Catalyst expression ``KCoreMerge``
(expressions/KCoreMerge.scala:33-63) is re-expressed with SQL
higher-order functions: cap each neighbor estimate at the current core,
sort descending, and take the h-index via an index-aware ``filter`` —
no UDF, stays in whole-stage codegen.

Edge representation matches the reference contract: supply each
undirected edge once (either direction); the algorithm symmetrizes by
messaging both endpoints. Scale notes: per-superstep state is one int
per vertex; the ``collect_list`` of neighbor estimates is bounded by
vertex degree — the same bound as the reference (hub vertices are the
skew risk in both; estimates are 4-byte ints, so a 10^7-degree hub costs
~40 MB, tolerable where collect-of-structs is not).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

KCORE_ID = "kcore"


def _kcore_merge(msgs: Column, core: Column) -> Column:
    """Largest l <= core with at least l neighbor estimates >= l.

    h-index over ``least(msg, core)`` sorted descending: with the capped
    estimates in decreasing order, positions i (1-based) satisfying
    ``est[i] >= i`` form a prefix whose length is the h-index.
    """
    capped_desc = F.reverse(F.array_sort(F.transform(msgs, lambda m: F.least(m, core))))
    return F.size(F.filter(capped_desc, lambda x, i: x >= i + F.lit(1)))


def k_core(graph: "GraphFrame", max_iter: int = 1_000_000_000) -> DataFrame:
    """Max k per vertex such that the vertex is in a k-core.

    Returns DF[id, kcore: int]; vertices with no edges get kcore 0.
    """
    from graphframes_spark.graphframe import GraphFrame

    degrees = graph.degrees.select(
        F.col(ID), F.col("degree").cast("int").alias("degree")
    )
    prepared = GraphFrame(degrees, graph.edges.select(SRC, DST))

    merged = _kcore_merge(Pregel.msg(), F.col(KCORE_ID))
    result = (
        prepared.pregel.setMaxIter(max_iter)
        .setCheckpointInterval(1)  # voting mode: see scc.py measurement
        .withVertexColumn(
            KCORE_ID,
            F.col("degree"),
            F.when(Pregel.msg().isNull(), F.col(KCORE_ID)).otherwise(merged),
        )
        .sendMsgToSrc(Pregel.dst(KCORE_ID))
        .sendMsgToDst(Pregel.src(KCORE_ID))
        .setUpdateActiveVertexExpression(
            Pregel.msg().isNotNull() & (F.col(KCORE_ID) != merged)
        )
        .setEarlyStopping(False)
        .setStopIfAllNonActiveVertices(True)
        .setSkipMessagesFromNonActiveVertices(False)
        .requiredSrcColumns(KCORE_ID)
        .requiredDstColumns(KCORE_ID)
        .aggMsgs(F.collect_list(Pregel.msg()))
        .run()
    )

    return (
        graph.vertices.select(ID)
        .join(result.select(ID, KCORE_ID), on=ID, how="left")
        .withColumn(KCORE_ID, F.coalesce(F.col(KCORE_ID), F.lit(0)))
    )
