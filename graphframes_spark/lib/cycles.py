"""Simple-cycle detection (Rocha–Thatte) on the DataFrame Pregel engine.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/DetectingCycles.scala:14-105):
each vertex stores path sequences (``array<array<id>>``); per superstep a
vertex forwards its sequences to out-neighbors (only sequences whose head
is <= the neighbor id, so each cycle is reported exactly once — rooted at
its minimum vertex), appending itself; a sequence arriving back at its
head is a found cycle. Output: one row per cycle, ``found_cycles:
array<id>`` (cycle vertex sequence starting and ending at the min id).

Scale notes: state size is bounded by the number of simple paths through
a vertex — inherently exponential in dense graphs (same bound as the
reference); checkpointing every N supersteps keeps lineage flat, and the
head<=dst filter prunes the search tree by symmetry.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel
from pyspark.sql import types as T

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

STORED_SEQ = "sequences"
FOUND_SEQ = "found_cycles"


def detecting_cycles(
    graph: "GraphFrame",
    checkpoint_interval: int = 1,
    use_local_checkpoints: Optional[bool] = None,
    storage_level: Optional[StorageLevel] = None,
    max_iter: int = 1_000_000_000,
) -> DataFrame:
    from graphframes_spark.graphframe import GraphFrame

    prepared = GraphFrame(
        graph.vertices.select(ID), graph.edges.select(SRC, DST)
    )
    vertex_dt = prepared.vertices.schema[ID].dataType
    seq_type = T.ArrayType(T.ArrayType(vertex_dt))

    init_sequences = F.array(F.array(F.col(ID)))
    init_found = F.array().cast(seq_type)

    # send stored sequences whose head <= the destination id
    sent = F.when(
        F.size(Pregel.src(STORED_SEQ)) != F.lit(0),
        F.filter(Pregel.src(STORED_SEQ), lambda x: x[0] <= Pregel.dst(ID)),
    ).otherwise(F.lit(None).cast(seq_type))

    # found: arriving sequences whose head == current id, closed by appending id
    update_found = F.when(Pregel.msg().isNull(), F.col(FOUND_SEQ)).otherwise(
        F.array_union(
            F.col(FOUND_SEQ),
            F.transform(
                F.filter(Pregel.msg(), lambda x: F.try_element_at(x, F.lit(1)) == F.col(ID)),
                lambda x: F.array_append(x, F.col(ID)),
            ),
        )
    )
    # continue: arriving sequences not already containing the current id
    update_sequences = F.transform(
        F.filter(Pregel.msg(), lambda x: ~F.array_contains(x, F.col(ID))),
        lambda x: F.array_append(x, F.col(ID)),
    )

    raw = (
        prepared.pregel.setMaxIter(max_iter)
        .setCheckpointInterval(checkpoint_interval)
        .setUseLocalCheckpoints(use_local_checkpoints)
        .setIntermediateStorageLevel(
            storage_level
            if storage_level is not None
            else StorageLevel.MEMORY_AND_DISK_DESER
        )
        .setEarlyStopping(False)
        .setStopIfAllNonActiveVertices(True)
        .setSkipMessagesFromNonActiveVertices(True)
        .sendMsgToDst(sent)
        .setUpdateActiveVertexExpression(
            Pregel.msg().isNotNull() & (F.size(update_sequences) > F.lit(0))
        )
        .withVertexColumn(STORED_SEQ, init_sequences, update_sequences)
        .withVertexColumn(FOUND_SEQ, init_found, update_found)
        .aggMsgs(F.flatten(F.collect_list(Pregel.msg())))
        .requiredSrcColumns(STORED_SEQ)
        .run()
    )

    # vid -> [[c1], [c2], ...] exploded to one row per cycle
    return (
        raw.select(
            F.col(ID),
            F.filter(F.col(FOUND_SEQ), lambda x: F.size(x) > F.lit(0)).alias(FOUND_SEQ),
        )
        .filter(F.size(F.col(FOUND_SEQ)) > F.lit(0))
        .select(F.explode(F.col(FOUND_SEQ)).alias(FOUND_SEQ))
    )
