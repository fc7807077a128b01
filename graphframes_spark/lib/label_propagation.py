"""Label propagation (community detection) on the DataFrame Pregel engine.

Semantics follow the reference DataFrame path
(/root/reference/core/src/main/scala/org/graphframes/lib/LabelPropagation.scala:85-146):
labels start as vertex ids; each superstep a vertex adopts the most
frequent label among incoming messages with a deterministic tie-break
(max count, then min label).

Where the reference folds ``collect_list`` into a per-row count map
(LabelPropagation.scala:132-140) — unbounded per-row state on hub
vertices — we aggregate with ``mode(deterministic=true)``: the same
winner and tie-break, computed as a partial-aggregatable map-side
combine whose state is bounded by the number of distinct labels, so a
10^7-degree hub never materializes a 10^7-element array in one row.

Deviation from the reference: a vertex that receives no messages keeps
its current label (the reference nulls it); this matches GraphX CDLP and
keeps results total.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

LABEL_ID = "label"


def label_propagation(
    graph: "GraphFrame", max_iter: int = 5, is_directed: bool = True
) -> DataFrame:
    from graphframes_spark.graphframe import GraphFrame

    prepared = GraphFrame(graph.vertices.select(ID), graph.edges.select(SRC, DST))

    new_label = F.coalesce(Pregel.msg(), F.col(LABEL_ID))

    pregel = (
        prepared.pregel.withVertexColumn(LABEL_ID, F.col(ID), new_label)
        .setMaxIter(max_iter)
        # voting materializes every superstep; per-superstep checkpoints
        # keep planning depth constant (see scc.py measurement)
        .setCheckpointInterval(1)
        .setStopIfAllNonActiveVertices(True)
        .setUpdateActiveVertexExpression(F.col(LABEL_ID) != new_label)
        .requiredSrcColumns(LABEL_ID)
        .sendMsgToDst(Pregel.src(LABEL_ID))
    )
    if not is_directed:
        # dst hint only when dst state is actually read: a non-id dst hint
        # forces the dst-side join (pregel escape-hatch contract)
        pregel = pregel.requiredDstColumns(LABEL_ID).sendMsgToSrc(
            Pregel.dst(LABEL_ID)
        )

    # mode(deterministic=True) = most frequent incoming label, ties -> lowest
    pregel = pregel.aggMsgs(F.mode(Pregel.msg(), deterministic=True))

    labels = pregel.run().select(ID, LABEL_ID)
    return graph.vertices.join(labels, on=ID, how="inner")
