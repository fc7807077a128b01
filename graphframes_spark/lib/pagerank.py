"""PageRank on the DataFrame Pregel engine.

The reference delegates PageRank to its GraphX fork
(/root/reference/core/src/main/scala/org/graphframes/lib/PageRank.scala:67-181)
but documents the DataFrame-Pregel recipe (lib/Pregel.scala:62-76). We
implement the normalized formulation directly on Pregel:

    rank_0(v)   = 1 / N
    rank_t+1(v) = resetProb / N + (1 - resetProb) * sum_{u->v} rank_t(u) / outDeg(u)

Dangling-vertex mass is not redistributed (GraphX-compatible). The
personalized variant replaces the uniform reset with an indicator on the
source vertex. Output mirrors the reference: vertices gain ``pagerank``,
edges gain ``weight`` = 1/outDeg(src).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Optional, Sequence

from pyspark.sql import functions as F

from graphframes_spark.pregel import Pregel
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

_OUT_DEG = "_pr_out_deg"


def _prepared_graph(graph: "GraphFrame") -> "GraphFrame":
    """Vertices reduced to (id, outDeg); edges to (src, dst)."""
    from graphframes_spark.graphframe import GraphFrame

    out_deg = graph.edges.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").alias(_OUT_DEG)
    )
    v = graph.vertices.select(ID).join(out_deg, on=ID, how="left_outer").select(
        F.col(ID), F.coalesce(F.col(_OUT_DEG), F.lit(1)).alias(_OUT_DEG)
    )
    e = graph.edges.select(SRC, DST)
    return GraphFrame(v, e)


def page_rank(
    graph: "GraphFrame",
    reset_probability: float = 0.15,
    source_id: Optional[Any] = None,
    max_iter: Optional[int] = None,
    tol: Optional[float] = None,
    weight_col: Optional[str] = None,
) -> "GraphFrame":
    """``weight_col`` (beyond-reference) switches to weighted PageRank:
    each vertex distributes rank proportionally to its out-edge weights
    (``w / Σ_out w``) instead of uniformly (``1 / outDeg``); the output
    edge ``weight`` column carries the normalized weights. The weight
    normalization is one extra src-keyed aggregation+join before the
    loop — per-superstep cost is identical to the uniform recipe."""
    from graphframes_spark.graphframe import GraphFrame

    if max_iter is None and tol is None:
        raise GraphFramesError("pageRank requires maxIter or tol")
    if max_iter is not None and tol is not None:
        raise GraphFramesError("pageRank accepts maxIter or tol, not both")
    if weight_col is not None and weight_col not in graph.edges.columns:
        raise GraphFramesError(f"edges have no weight column {weight_col!r}")
    alpha = reset_probability

    if weight_col is not None:
        return _weighted_page_rank(
            graph, alpha, source_id, max_iter, tol, weight_col
        )

    prepared = _prepared_graph(graph)
    # count the raw vertex table: the left join with out-degrees (unique
    # key) preserves row count, and skipping it avoids running the
    # groupBy+join once just to size the graph
    n = graph.vertices.count()
    if n == 0:
        spark = graph.spark
        empty_v = graph.vertices.withColumn("pagerank", F.lit(0.0)).limit(0)
        empty_e = graph.edges.withColumn("weight", F.lit(0.0)).limit(0)
        return GraphFrame(empty_v, empty_e)

    if source_id is not None:
        init = F.when(F.col(ID) == F.lit(source_id), F.lit(1.0)).otherwise(F.lit(0.0))
        reset = F.when(F.col(ID) == F.lit(source_id), F.lit(alpha)).otherwise(F.lit(0.0))
    else:
        init = F.lit(1.0 / n)
        reset = F.lit(alpha / n)

    new_rank = reset + F.lit(1.0 - alpha) * F.coalesce(Pregel.msg(), F.lit(0.0))

    pregel = (
        prepared.pregel.withVertexColumn("pagerank", init, new_rank)
        .sendMsgToDst(Pregel.src("pagerank") / Pregel.src(_OUT_DEG))
        .aggMsgs(F.sum(Pregel.msg()))
        .requiredSrcColumns("pagerank", _OUT_DEG)
        # interval 5, deliberately wider than the Pregel default (2) —
        # round 8 A/B'd 2 vs 5 both ways and 5 dominates: short recipes
        # (maxIter <= 5: katz/ppr/eigenvector defaults) stay ONE fully
        # fused job with zero checkpoints (interval 2 cost them 2.7-5.5x
        # in the headline bench), 10-iteration PageRank is a wash at
        # sf0.1 (7.69s @2 vs 7.63s @5), and at the 10x scale rung wider
        # cadence wins outright (BENCH_ldbc_10x pagerank_interval_curve:
        # 1→265s, 2→152s, 4→123s). See SCALE.md "checkpoint-cadence
        # optimum moves with scale".
        .setCheckpointInterval(5)
    )

    if tol is not None:
        pregel = (
            pregel.setMaxIter(1_000_000)
            .setUpdateActiveVertexExpression(
                F.abs(new_rank - F.col("pagerank")) >= F.lit(tol)
            )
            .setStopIfAllNonActiveVertices(True)
            # tolerance mode materializes every superstep (convergence
            # probe); per-superstep checkpoints keep planning depth 1
            .setCheckpointInterval(1)
        )
    else:
        pregel = pregel.setMaxIter(max_iter)

    ranks = pregel.run().select(ID, "pagerank")

    # The Pregel state holds every original vertex exactly once, so when
    # the input vertex relation carries nothing beyond the id there is
    # nothing to re-attach — the join would only re-shuffle the result to
    # produce itself. (Common case: graphs built from bare edge lists.)
    if graph.vertices.columns == [ID]:
        out_v = ranks
    else:
        out_v = graph.vertices.join(ranks, on=ID, how="left_outer")
    deg = prepared.vertices
    out_e = (
        graph.edges.join(deg.withColumnRenamed(ID, SRC), on=SRC, how="left_outer")
        .withColumn("weight", F.lit(1.0) / F.col(_OUT_DEG))
        .drop(_OUT_DEG)
    )
    return GraphFrame(out_v, out_e)


def _weighted_page_rank(
    graph: "GraphFrame",
    alpha: float,
    source_id: Optional[Any],
    max_iter: Optional[int],
    tol: Optional[float],
    weight_col: str,
) -> "GraphFrame":
    """rank_t+1(v) = reset + (1-α) · Σ_{u→v} rank_t(u) · w(u,v)/Σ_out w(u).

    Zero/negative total out-weight vertices distribute nothing (their
    edges get weight 0), mirroring how the uniform recipe treats
    dangling vertices — mass is not redistributed (GraphX-compatible).
    """
    from graphframes_spark.graphframe import GraphFrame

    n = graph.vertices.count()
    if n == 0:
        empty_v = graph.vertices.withColumn("pagerank", F.lit(0.0)).limit(0)
        empty_e = graph.edges.withColumn("weight", F.lit(0.0)).limit(0)
        return GraphFrame(empty_v, empty_e)

    wsum = graph.edges.groupBy(SRC).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_pr_wsum")
    )
    norm_e = (
        graph.edges.select(SRC, DST, F.col(weight_col).cast("double").alias("_w"))
        .join(wsum, on=SRC)
        .select(
            SRC,
            DST,
            F.when(
                F.col("_pr_wsum") > 0, F.col("_w") / F.col("_pr_wsum")
            )
            .otherwise(F.lit(0.0))
            .alias("_pr_w"),
        )
    )
    prepared = GraphFrame(graph.vertices.select(ID), norm_e)

    if source_id is not None:
        init = F.when(F.col(ID) == F.lit(source_id), F.lit(1.0)).otherwise(F.lit(0.0))
        reset = F.when(F.col(ID) == F.lit(source_id), F.lit(alpha)).otherwise(F.lit(0.0))
    else:
        init = F.lit(1.0 / n)
        reset = F.lit(alpha / n)

    new_rank = reset + F.lit(1.0 - alpha) * F.coalesce(Pregel.msg(), F.lit(0.0))
    pregel = (
        prepared.pregel.withVertexColumn("pagerank", init, new_rank)
        .sendMsgToDst(Pregel.src("pagerank") * Pregel.edge("_pr_w"))
        .aggMsgs(F.sum(Pregel.msg()))
        .requiredSrcColumns("pagerank")
        .setCheckpointInterval(5)  # see page_rank: short runs stay fused
    )
    if tol is not None:
        pregel = (
            pregel.setMaxIter(1_000_000)
            .setUpdateActiveVertexExpression(
                F.abs(new_rank - F.col("pagerank")) >= F.lit(tol)
            )
            .setStopIfAllNonActiveVertices(True)
            .setCheckpointInterval(1)
        )
    else:
        pregel = pregel.setMaxIter(max_iter)

    ranks = pregel.run().select(ID, "pagerank")
    if graph.vertices.columns == [ID]:  # see page_rank: nothing to re-attach
        out_v = ranks
    else:
        out_v = graph.vertices.join(ranks, on=ID, how="left_outer")
    out_e = norm_e.withColumnRenamed("_pr_w", "weight")
    return GraphFrame(out_v, out_e)


def parallel_personalized_page_rank(
    graph: "GraphFrame",
    reset_probability: float = 0.15,
    source_ids: Optional[Sequence[Any]] = None,
    max_iter: Optional[int] = None,
    vector_output: bool = False,
) -> "GraphFrame":
    """PPR from k sources simultaneously; vertex column ``pageranks`` is an
    array<double> aligned with ``source_ids``, or an ML dense vector when
    ``vector_output`` is set (the reference's native type —
    lib/ParallelPersonalizedPageRank.scala:50-55)."""
    from graphframes_spark.graphframe import GraphFrame

    if not source_ids:
        raise GraphFramesError("parallelPersonalizedPageRank requires sourceIds")
    if max_iter is None:
        raise GraphFramesError("parallelPersonalizedPageRank requires maxIter")
    alpha = reset_probability
    k = len(source_ids)

    prepared = _prepared_graph(graph)
    sources = F.array(*[F.lit(s) for s in source_ids])

    init = F.transform(sources, lambda s: F.when(F.col(ID) == s, 1.0).otherwise(0.0))
    zeros = F.array(*[F.lit(0.0) for _ in range(k)])
    msg_or_zero = F.coalesce(Pregel.msg(), zeros)
    update = F.zip_with(
        msg_or_zero,
        sources,
        lambda m, s: F.lit(1.0 - alpha) * m
        + F.when(F.col(ID) == s, F.lit(alpha)).otherwise(F.lit(0.0)),
    )

    ranks = (
        prepared.pregel.withVertexColumn("pageranks", init, update)
        .sendMsgToDst(
            F.transform(
                Pregel.src("pageranks"), lambda r: r / Pregel.src(_OUT_DEG)
            )
        )
        # element-wise sum as k parallel scalar sums (k = |sourceIds|):
        # fully partial-aggregatable, no per-row collect_list of k-vectors
        # on hub vertices (the reference's GraphX path reduces pairwise too)
        .aggMsgs(
            F.array(
                *[
                    F.sum(F.element_at(Pregel.msg(), i + 1))
                    for i in range(k)
                ]
            )
        )
        .requiredSrcColumns("pageranks", _OUT_DEG)
        .setCheckpointInterval(5)  # see page_rank: short runs stay fused
        .setMaxIter(max_iter)
        .run()
        .select(ID, "pageranks")
    )

    if vector_output:
        from pyspark.ml.functions import array_to_vector

        ranks = ranks.withColumn("pageranks", array_to_vector(F.col("pageranks")))

    if graph.vertices.columns == [ID]:  # see page_rank: nothing to re-attach
        out_v = ranks
    else:
        out_v = graph.vertices.join(ranks, on=ID, how="left_outer")
    deg = prepared.vertices
    out_e = (
        graph.edges.join(deg.withColumnRenamed(ID, SRC), on=SRC, how="left_outer")
        .withColumn("weight", F.lit(1.0) / F.col(_OUT_DEG))
        .drop(_OUT_DEG)
    )
    return GraphFrame(out_v, out_e)
