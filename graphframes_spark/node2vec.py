"""node2vec second-order biased random walks (Grover & Leskovec, KDD'16).

Beyond-reference: the reference ships first-order walks with restart
(rw/RandomWalkWithRestart.scala:18-88); node2vec's return parameter ``p``
and in-out parameter ``q`` need one extra hop of context (the previous
vertex), which its GraphX lineage never added. This implementation keeps
the reference's batched-DataFrame shape but replaces ``rand()``/
``shuffle()`` with *hash-derived* randomness, so walks are fully
deterministic for a given seed — stable under task retry and AQE
re-planning (the reference's own caveat, RandomWalkBase.scala:28-44),
and exactly reproducible by an external oracle.

Per step, for a walk ...prev -> cur, each out-neighbor ``x`` of cur is
weighted

    1/p  if x == prev          (return)
    1    if prev -> x exists   (stay in the BFS ring)
    1/q  otherwise             (explore outward)

and one neighbor is drawn by the Gumbel-max trick: ``argmax ln(w) + G``
with ``G = -ln(-ln(u))`` and ``u`` a uniform derived from
``xxhash64(start, walk_idx, step, candidate, seed)`` — a weighted
categorical sample computed as a plain ``max_by`` aggregation, no UDF.

Scale path per step: (1) state ⋈ edges on the current vertex (edges
pre-partitioned on src, only the walk state shuffles), (2) candidates ⟕
edges on (prev, candidate) for the ring test, (3) ``max_by`` groupBy per
walk. Three bounded shuffles per step — the price of second-order bias —
with per-walk state a single constant-width row; finished walks leave
the loop immediately and long lineages are cut by local checkpoints.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.harness import IterationHarness
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

START = "start"
WALK_IDX = "walk_idx"
WALK = "random_walk"

_PRIME = 1_000_000_007


def _uniform(*cols) -> "F.Column":
    """Deterministic uniform in (0, 1) from a hash of the inputs."""
    h = F.pmod(F.xxhash64(*cols), F.lit(_PRIME)) + F.lit(1)
    return h.cast("double") / F.lit(float(_PRIME + 2))


def node2vec_walks(
    graph: "GraphFrame",
    walk_length: int = 10,
    num_walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    use_edge_direction: bool = True,
    max_nbrs: Optional[int] = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """DF[start: idType, walk_idx: int, random_walk: array<idType>].

    One row per (starting vertex with >= 1 out-neighbor, walk index in
    1..num_walks_per_node); ``random_walk`` begins with the start vertex
    and holds at most ``walk_length + 1`` vertices (shorter when the walk
    hits a dead end). ``max_nbrs`` caps per-vertex fan-out with the same
    k-min-by-hash sample as the reference's ``KMinSampling``.
    """
    if walk_length < 1:
        raise GraphFramesError(f"walk_length must be >= 1, got {walk_length}")
    if num_walks_per_node < 1:
        raise GraphFramesError(
            f"num_walks_per_node must be >= 1, got {num_walks_per_node}"
        )
    if p <= 0 or q <= 0:
        raise GraphFramesError(f"p and q must be > 0, got p={p} q={q}")

    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=1)
    id_type = graph.vertices.schema[ID].dataType
    walk_type = T.ArrayType(id_type)

    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if not use_edge_direction:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    e = e.distinct()
    if max_nbrs is not None:
        ranked = e.withColumn(
            "_n2v_rank", F.xxhash64(F.col(SRC), F.col(DST), F.lit(seed))
        )
        w = Window.partitionBy(SRC).orderBy("_n2v_rank")
        e = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_nbrs)
            .drop("_n2v_rank", "_rn")
        )
    e = harness.pin(e.repartition(F.col(SRC)))

    starts = e.select(F.col(SRC).alias(START)).distinct()
    state = starts.select(
        START,
        F.explode(
            F.sequence(F.lit(1), F.lit(num_walks_per_node))
        ).alias(WALK_IDX),
        F.lit(None).cast(id_type).alias("_prev"),
        F.col(START).alias("_cur"),
        F.array(F.col(START)).cast(walk_type).alias(WALK),
    )
    state = harness.checkpoint(state, eager=True)
    done: list[DataFrame] = []

    for step in harness.iterations(walk_length):
        cand = state.join(
            e.select(F.col(SRC).alias("_cur"), F.col(DST).alias("_cand")),
            on="_cur",
            how="left",
        )
        # walks whose current vertex has no out-neighbor are finished
        done.append(
            harness.checkpoint(
                cand.filter(F.col("_cand").isNull()).select(START, WALK_IDX, WALK),
                eager=True,
            )
        )
        cand = cand.filter(F.col("_cand").isNotNull())
        # BFS-ring test: does prev -> cand exist? (left join marker)
        ring = e.select(
            F.col(SRC).alias("_prev"), F.col(DST).alias("_cand"), F.lit(True).alias("_ring")
        )
        cand = cand.join(ring, on=["_prev", "_cand"], how="left")
        weight = (
            F.when(F.col("_prev").isNull(), F.lit(1.0))  # first hop: uniform
            .when(F.col("_cand") == F.col("_prev"), F.lit(1.0 / p))
            .when(F.col("_ring"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = _uniform(
            F.col(START), F.col(WALK_IDX), F.lit(step), F.col("_cand"), F.lit(seed)
        )
        score = F.log(weight) - F.log(-F.log(u))
        chosen = cand.groupBy(START, WALK_IDX).agg(
            F.max_by(
                F.struct(F.col("_cur"), F.col("_cand"), F.col(WALK)),
                # candidate id as a deterministic tie-break
                F.struct(score.alias("_s"), F.col("_cand").alias("_t")),
            ).alias("_pick")
        )
        state = chosen.select(
            START,
            WALK_IDX,
            F.col("_pick._cur").alias("_prev"),
            F.col("_pick._cand").alias("_cur"),
            F.array_append(F.col(f"_pick.{WALK}"), F.col("_pick._cand")).alias(WALK),
        )
        if step % checkpoint_interval == 0 or step == walk_length:
            state = harness.checkpoint(state, eager=True)
        harness.rotate()

    out = state.select(START, WALK_IDX, WALK)
    for d in done:
        out = out.unionByName(d)
    return harness.finish(out)
