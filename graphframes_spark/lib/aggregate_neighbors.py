"""Multi-hop neighbor aggregation with named accumulators.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/AggregateNeighbors.scala:43-418):
breadth-first frontier expansion from a set of starting vertices, up to
``maxHops``; per hop the frontier joins the pre-shaped semi-triplet
relation (edge attrs + dst vertex attrs, hash-partitioned on src), each
accumulator is updated by its expression (which may reference the
accumulator itself, ``srcAttr(...)``, ``dstAttr(...)``,
``edgeAttr(...)``), and rows satisfying the stopping / target condition
are moved to the result set. Result: DF[id, hop, <accumulators...>]
(the reference emits accumulators first, then id/hop — column set
matches; use select for exact order).

Scale notes: the semi-triplet relation is built and repartitioned on
``src`` once, so every hop's frontier join reuses one shuffle layout;
states/finished are persisted per hop with the previous hop's cache
dropped, and checkpointed every N hops to cut lineage (same persist
queue discipline as the reference, AggregateNeighbors.scala:297-412).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.harness import IterationHarness
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

STOPPED = "_stopped"
HOP = "hop"
SRC_ATTRS = "src_attributes"
DST_ATTRS = "dst_attributes"
EDGE_ATTRS = "edge_attributes"


def src_attr(name: str) -> Column:
    """Reference a source-vertex attribute inside accumulator/stop/target
    expressions (AggregateNeighbors.scala:436)."""
    return F.col(SRC_ATTRS).getField(name)


def dst_attr(name: str) -> Column:
    return F.col(DST_ATTRS).getField(name)


def edge_attr(name: str) -> Column:
    return F.col(EDGE_ATTRS).getField(name)


class AggregateNeighbors:
    """Builder for multi-hop neighbor aggregation; call ``run()`` to execute."""

    # static helpers mirroring the reference companion object
    srcAttr = staticmethod(src_attr)
    dstAttr = staticmethod(dst_attr)
    edgeAttr = staticmethod(edge_attr)

    def __init__(self, graph: "GraphFrame") -> None:
        self._graph = graph
        self._starting_vertices: Column = F.lit(True)
        self._max_hops: int = 3
        self._stopping_condition: Optional[Column] = None
        self._target_condition: Optional[Column] = None
        self._acc_names: list[str] = []
        self._acc_inits: list[Column] = []
        self._acc_updates: list[Column] = []
        self._required_vertex_attrs: list[str] = []
        self._required_edge_attrs: list[str] = []
        self._edge_filter: Column = F.lit(True)
        self._remove_loops: bool = False
        self._checkpoint_interval: int = 2
        # None -> harness resolves spark.graphframes.useLocalCheckpoints
        self._use_local_checkpoints: Optional[bool] = None

    # ------------------------------------------------------------- builders

    def setStartingVertices(self, value: Column) -> "AggregateNeighbors":
        self._starting_vertices = value
        return self

    def setMaxHops(self, value: int) -> "AggregateNeighbors":
        if value <= 0:
            raise GraphFramesError("maxHops should be positive.")
        self._max_hops = value
        return self

    def setStoppingCondition(self, value: Column) -> "AggregateNeighbors":
        self._stopping_condition = value
        return self

    def setTargetCondition(self, value: Column) -> "AggregateNeighbors":
        self._target_condition = value
        return self

    def setAccumulators(
        self, names: Sequence[str], inits: Sequence[Column], updates: Sequence[Column]
    ) -> "AggregateNeighbors":
        if not (len(names) == len(inits) == len(updates)):
            raise GraphFramesError("Inits, updates and names must have the same size.")
        self._acc_names = list(names)
        self._acc_inits = list(inits)
        self._acc_updates = list(updates)
        return self

    def addAccumulator(
        self, name: str, init: Column, update: Column
    ) -> "AggregateNeighbors":
        self._acc_names.append(name)
        self._acc_inits.append(init)
        self._acc_updates.append(update)
        return self

    def setRequiredVertexAttributes(self, values: Sequence[str]) -> "AggregateNeighbors":
        self._required_vertex_attrs = list(values)
        return self

    def setRequiredEdgeAttributes(self, values: Sequence[str]) -> "AggregateNeighbors":
        self._required_edge_attrs = list(values)
        return self

    def setEdgeFilter(self, value: Column) -> "AggregateNeighbors":
        self._edge_filter = value
        return self

    def setRemoveLoops(self, value: bool) -> "AggregateNeighbors":
        self._remove_loops = value
        return self

    def setCheckpointInterval(self, value: int) -> "AggregateNeighbors":
        self._checkpoint_interval = value
        return self

    def setUseLocalCheckpoints(self, value: bool) -> "AggregateNeighbors":
        self._use_local_checkpoints = value
        return self

    # --------------------------------------------------------------- engine

    def run(self) -> DataFrame:
        if not self._acc_names:
            raise GraphFramesError("At least one accumulator must be added")
        if self._stopping_condition is None and self._target_condition is None:
            raise GraphFramesError(
                "Any of target or stopping conditions should be provided"
            )

        graph = self._graph
        harness = IterationHarness(
            graph.spark,
            checkpoint_interval=self._checkpoint_interval,
            use_local_checkpoints=self._use_local_checkpoints,
        )

        req_attrs = self._required_vertex_attrs or graph.vertices.columns
        req_edge_attrs = self._required_edge_attrs or graph.edges.columns

        vertices_with_attrs = graph.vertices.select(
            F.col(ID).alias("dst_id"),
            F.struct(*[F.col(c) for c in req_attrs]).alias(DST_ATTRS),
        )

        edges = graph.edges
        if self._remove_loops:
            edges = edges.filter(F.col(SRC) != F.col(DST))
        # pre-shaped, src-partitioned relation reused by every hop's join
        semi_triplets = harness.pin(
            edges.select(
                F.col(SRC),
                F.col(DST),
                F.struct(*[F.col(c) for c in req_edge_attrs]).alias(EDGE_ATTRS),
            )
            .join(vertices_with_attrs, F.col("dst_id") == F.col(DST), "left")
            .repartition(F.col(SRC))
        )

        states_cols = self._acc_names + [SRC_ATTRS, "src_id", HOP, STOPPED]
        finished_cols = self._acc_names + ["src_id", HOP]

        states = graph.vertices.filter(self._starting_vertices)
        for name, init in zip(self._acc_names, self._acc_inits):
            states = states.withColumn(name, init)
        states = (
            states.withColumn(SRC_ATTRS, F.struct(*[F.col(c) for c in req_attrs]))
            .withColumnRenamed(ID, "src_id")
            .withColumn(HOP, F.lit(0))
            .withColumn(STOPPED, F.lit(False))
            .select(*states_cols)
        )
        states = harness.persist(states)

        finished = harness.persist(
            states.filter(F.col(STOPPED))
            .select(*finished_cols)
            .withColumnRenamed("src_id", ID)
        )
        finished.count()

        is_target = (
            self._target_condition
            if self._target_condition is not None
            else F.lit(False)
        )
        should_stop = (
            self._stopping_condition
            if self._stopping_condition is not None
            else F.lit(False)
        ) | is_target

        converged = states.isEmpty()
        for hop in harness.iterations(self._max_hops):
            if converged:
                break
            full_triplets = states.join(
                semi_triplets, F.col("src_id") == F.col(SRC)
            ).filter(self._edge_filter)

            cols = [u.alias(n) for u, n in zip(self._acc_updates, self._acc_names)]
            cols += [
                should_stop.alias(STOPPED),
                is_target.alias("_is_target"),
                F.lit(hop).alias(HOP),
                F.col(DST).alias("src_id"),
                F.col(DST_ATTRS).alias(SRC_ATTRS),
            ]
            updated = full_triplets.select(*cols)

            new_states = updated.filter(~F.col(STOPPED)).select(*states_cols)
            newly_finished = (
                updated.filter(F.col("_is_target"))
                if self._target_condition is not None
                else updated.filter(F.col(STOPPED))
            )
            new_finished = finished.unionByName(
                newly_finished.select(*finished_cols).withColumnRenamed("src_id", ID)
            )

            if self._checkpoint_interval > 0 and hop % self._checkpoint_interval == 0:
                new_states = harness.checkpoint(new_states)
                new_finished = harness.checkpoint(new_finished)
            states = harness.persist(new_states)
            finished = harness.persist(new_finished)
            # materialize both before dropping the previous hop's cache
            finished.count()
            converged = states.isEmpty()
            harness.rotate()

        return harness.finish(finished)
