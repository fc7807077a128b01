"""Belief propagation on an Ising-model grid (colored-fields schedule).

Semantics follow the reference example
(/root/reference/core/src/main/scala/org/graphframes/examples/BeliefPropagation.scala:216-258,
``runBPwithGraphFrames``): 2-color the grid so no neighbors share a
color, then per iteration and per color run one ``aggregateMessages``
round — vertices of the active color receive ``b_ij * belief_j`` from
every neighbor, sum, and update ``belief = sigmoid(a_i + sum)`` (with
the numerically-stable log1pExp form). The result adds a ``belief``
column: the mean-field estimate of P(x_i = +1).

The reference's logistic is a Scala UDF; here it is plain column algebra
(``exp(-log1pExp(-x))`` via ``when``-guarded log1p/exp) — stays in
whole-stage codegen. Each color-step is one join + one aggregation;
vertex state is local-checkpointed per step (same as the reference's
``localCheckpoint``) so 2 * numIter rounds never grow the plan.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

from graphframes_spark.util import ID

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame


def _log1p_exp(x: Column) -> Column:
    """Numerically stable log(1 + exp(x)) (BeliefPropagation.scala:264-270)."""
    return F.when(x > 0, x + F.log1p(F.exp(-x))).otherwise(F.log1p(F.exp(x)))


def _logistic(x: Column) -> Column:
    return F.exp(-_log1p_exp(-x))


def belief_propagation(graph: "GraphFrame", num_iter: int = 5) -> "GraphFrame":
    """Run colored-schedule BP on a grid Ising model built by
    :func:`graphframes_spark.examples.grid_ising_model` (vertex potential
    ``a`` + grid coords ``i``/``j``; edge coupling ``b``). Returns the
    graph with a ``belief`` vertex column = P(x_i = +1)."""
    from graphframes_spark.graphframe import GraphFrame
    from graphframes_spark.lib.aggregate_messages import AggregateMessages as AM

    # grid 2-coloring: no neighbors share (i + j) % 2
    colored = graph.vertices.withColumn(
        "color", (F.col("i") + F.col("j")) % 2
    ).withColumn("belief", F.lit(0.0))
    gx = GraphFrame(colored, graph.edges)
    num_colors = 2

    for _ in range(num_iter):
        for color in range(num_colors):
            msg_for_src = F.when(
                AM.src["color"] == color, AM.edge["b"] * AM.dst["belief"]
            )
            msg_for_dst = F.when(
                AM.dst["color"] == color, AM.edge["b"] * AM.src["belief"]
            )
            aggregates = gx.aggregateMessages(
                F.sum(AM.msg).alias("aggMess"),
                sendToSrc=msg_for_src,
                sendToDst=msg_for_dst,
            )
            v = gx.vertices
            joined = v.join(
                aggregates.withColumnRenamed(ID, "_msg_id"),
                v[ID] == F.col("_msg_id"),
                "left_outer",
            ).drop("_msg_id")
            new_belief = F.when(
                (F.col("color") == color) & F.col("aggMess").isNotNull(),
                _logistic(F.col("aggMess") + F.col("a")),
            ).otherwise(F.col("belief"))
            new_vertices = (
                joined.withColumn("_new_belief", new_belief)
                .drop("aggMess", "belief")
                .withColumnRenamed("_new_belief", "belief")
                .localCheckpoint(eager=False)
            )
            gx = GraphFrame(new_vertices, gx.edges)

    return GraphFrame(gx.vertices.drop("color"), gx.edges)
