"""aggregateMessages: one round of per-triplet messaging + groupBy-id agg.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/AggregateMessages.scala:61-189):
messages are expressions over the triplet struct columns ``src``/``edge``/
``dst``; messages to src and to dst are unioned, then aggregated per
target vertex id. Multiple message columns become one struct message.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

MSG_COL_NAME = "MSG"


class _ClassProperty:
    def __init__(self, f):
        self.f = f
        self.__doc__ = f.__doc__

    def __get__(self, instance, owner):
        return self.f(owner)


class AggregateMessages:
    """Column helpers for :meth:`GraphFrame.aggregateMessages`."""

    @_ClassProperty
    def src(cls) -> Column:
        return F.col(SRC)

    @_ClassProperty
    def dst(cls) -> Column:
        return F.col(DST)

    @_ClassProperty
    def edge(cls) -> Column:
        return F.col("edge")

    @_ClassProperty
    def msg(cls) -> Column:
        return F.col(MSG_COL_NAME)


def _as_columns(value) -> list[Column]:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return [F.expr(c) if isinstance(c, str) else c for c in value]
    return [F.expr(value) if isinstance(value, str) else value]


def aggregate_messages(
    graph: "GraphFrame",
    agg_col: Union[Column, str, Sequence[Union[Column, str]]],
    send_to_src: Optional[Union[Column, str, Sequence]] = None,
    send_to_dst: Optional[Union[Column, str, Sequence]] = None,
) -> DataFrame:
    to_src = _as_columns(send_to_src)
    to_dst = _as_columns(send_to_dst)
    aggs = _as_columns(agg_col)
    if not to_src and not to_dst:
        raise GraphFramesError(
            "aggregateMessages requires messages to src, dst, or both "
            "(set sendToSrc / sendToDst)."
        )
    if not aggs:
        raise GraphFramesError("aggregateMessages requires at least one aggregate column.")

    triplets = graph.triplets

    def msgs(columns: list[Column], target_id: Column) -> DataFrame:
        if len(columns) == 1:
            return triplets.select(target_id.alias(ID), columns[0].alias(MSG_COL_NAME))
        return triplets.select(
            target_id.alias(ID), F.struct(*columns).alias(MSG_COL_NAME)
        )

    parts = []
    if to_src:
        parts.append(msgs(to_src, triplets[SRC][ID]))
    if to_dst:
        parts.append(msgs(to_dst, triplets[DST][ID]))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    return union.groupBy(ID).agg(*aggs)
