"""Power Iteration Clustering — delegates to ``pyspark.ml.clustering``.

Mirrors the reference wrapper
(/root/reference/core/src/main/scala/org/graphframes/GraphFrame.scala:894-930):
PIC (Lin & Cohen) is already PySpark-native via
``PowerIterationClustering.assignClusters``; this wrapper handles the
surrogate-ID mapping for non-integral vertex IDs and the implicit unit
weight column.

Scale notes: PIC's per-iteration cost is one shuffle over the (src, dst,
weight) affinity matrix — the ml implementation handles partitioning; the
only added work here is the surrogate-ID join for string IDs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.indexing import has_integral_id_type, indexed_edges, indexed_vertices
from graphframes_spark.util import ATTR, DST, ID, LONG_DST, LONG_ID, LONG_SRC, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame


def power_iteration_clustering(
    graph: "GraphFrame", k: int, max_iter: int = 20, weight_col: Optional[str] = None
) -> DataFrame:
    """Cluster assignment per vertex: DF[id, cluster: int]."""
    from pyspark.ml.clustering import PowerIterationClustering

    if graph.edges.isEmpty():
        # assignClusters only labels vertices present in the affinity
        # matrix; ml's KMeans throws outright on an empty one
        return (
            graph.vertices.select(F.col(ID).cast("long").alias(ID))
            if has_integral_id_type(graph.vertices)
            else graph.vertices.select(ID)
        ).withColumn("cluster", F.lit(0).cast("int")).limit(0)

    if has_integral_id_type(graph.vertices):
        edges = graph.edges
        idx_v = None
    else:
        idx_v = indexed_vertices(graph.vertices)
        ie = indexed_edges(graph.edges, idx_v)
        if weight_col is not None:
            edges = ie.select(
                F.col(LONG_SRC).alias(SRC),
                F.col(LONG_DST).alias(DST),
                F.col(ATTR)[weight_col].alias(weight_col),
            )
        else:
            edges = ie.select(F.col(LONG_SRC).alias(SRC), F.col(LONG_DST).alias(DST))

    pic = PowerIterationClustering(k=k, maxIter=max_iter, srcCol=SRC, dstCol=DST)
    if weight_col is not None:
        pic.setWeightCol(weight_col)
        result = pic.assignClusters(edges)
    else:
        pic.setWeightCol("_weight")
        result = pic.assignClusters(edges.withColumn("_weight", F.lit(1.0)))

    if idx_v is None:
        return result
    mapping = idx_v.select(F.col(LONG_ID).alias(ID), F.col(ATTR)[ID].alias("_orig"))
    return result.join(mapping, on=ID, how="inner").select(
        F.col("_orig").alias(ID), F.col("cluster")
    )
