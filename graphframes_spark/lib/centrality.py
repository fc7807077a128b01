"""Landmark-sampled harmonic / closeness centrality, plus Katz.

Beyond-reference: the reference's GraphX-derived library has no
centrality operator besides PageRank; harmonic and closeness centrality
are the standard distance-based companions (Boldi & Vigna, "Axioms for
Centrality", Internet Mathematics 2014) and the landmark-sampling
estimator is the classic Eppstein-Wang scheme (SODA 2001 — sample k
seeds, scale by n/k).

Built entirely on :mod:`graphframes_spark.lib.shortest_paths`: one
frontier-relaxation BFS over the landmark set produces the bounded
``distances: map<id, int>`` column, and every centrality statistic is
then a per-row higher-order function over ``map_values`` — no extra
shuffle, no explode, no UDF. At 100 TB the incremental cost over the
BFS itself is zero; accuracy is controlled by the landmark sample size
(|L| landmarks give a (n-1)/|L|-scaled unbiased estimate of the exact
sums, per Eppstein-Wang).

Directionality note: ``shortest_paths`` measures d(v -> landmark) along
edge direction, so with ``is_directed=True`` these are *outbound*
centralities (how quickly v reaches the sampled set); run on
``graph.asReversed()`` for the inbound variant, or pass
``is_directed=False``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.lib.shortest_paths import DISTANCE_ID, shortest_paths

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

N_REACHED = "n_reached"
DIST_SUM = "dist_sum"
HARMONIC = "harmonic"
CLOSENESS = "closeness"


def _positive_dists(distances: Column) -> Column:
    # self-distance 0 (a vertex that IS a landmark) is excluded: both
    # harmonic and closeness sum over *other* vertices only
    return F.filter(F.map_values(distances), lambda d: d > F.lit(0))


def eccentricity(
    graph: "GraphFrame",
    landmarks: Sequence[Any],
    is_directed: bool = True,
) -> DataFrame:
    """Per-landmark inbound eccentricity — DF[landmark, eccentricity:
    int, n_reached: long].

    ``eccentricity`` is the maximum hop distance over every vertex that
    reaches the landmark (d(v → landmark) along edge direction);
    ``n_reached`` counts those vertices, the landmark itself included.
    ``max(eccentricity)`` over a landmark sample is the standard
    pseudo-diameter lower bound (double sweep). Cost: the landmark BFS
    itself plus one explode + one landmark-keyed aggregation — at most
    |landmarks| groups, partial-aggregatable."""
    sp = shortest_paths(graph, landmarks, is_directed)
    return (
        sp.select(F.explode(F.col(DISTANCE_ID)).alias("landmark", "_d"))
        .groupBy("landmark")
        .agg(
            F.max("_d").alias("eccentricity"),
            F.count(F.lit(1)).alias(N_REACHED),
        )
    )


def harmonic_centrality(
    graph: "GraphFrame",
    landmarks: Sequence[Any],
    is_directed: bool = True,
) -> DataFrame:
    """Per-vertex distance statistics over the landmark sample —
    DF[<vertex columns>, n_reached: int, dist_sum: long,
    harmonic: double, closeness: double].

    - ``n_reached``: landmarks (excluding the vertex itself) reachable
      from the vertex.
    - ``dist_sum``: total hop distance to those landmarks.
    - ``harmonic``: Σ 1/d — the harmonic-centrality partial sum (scale
      by (n-1)/|landmarks| for the Eppstein-Wang estimate; the raw sum
      is returned so callers control normalization).
    - ``closeness``: n_reached / dist_sum (0.0 when nothing is reached)
      — the reached-mass closeness in the landmark sample.
    """
    sp = shortest_paths(graph, landmarks, is_directed)
    vals = _positive_dists(F.col(DISTANCE_ID))
    n_reached = F.size(vals)
    dist_sum = F.aggregate(
        vals, F.lit(0).cast("long"), lambda acc, d: acc + d.cast("long")
    )
    harmonic = F.aggregate(
        vals, F.lit(0.0), lambda acc, d: acc + F.lit(1.0) / d.cast("double")
    )
    out_cols = [c for c in sp.columns if c != DISTANCE_ID]
    return sp.select(
        *out_cols,
        n_reached.alias(N_REACHED),
        dist_sum.alias(DIST_SUM),
        harmonic.alias(HARMONIC),
        F.when(dist_sum > 0, n_reached.cast("double") / dist_sum.cast("double"))
        .otherwise(F.lit(0.0))
        .alias(CLOSENESS),
    )


def katz_centrality(
    graph: "GraphFrame",
    alpha: float = 0.1,
    max_iter: int = 10,
    normalized: bool = False,
) -> DataFrame:
    """Truncated Katz centrality — DF[<vertex columns>, katz: double].

    After ``max_iter`` supersteps of ``c ← α·Aᵀ(1 + c)`` from ``c₀ = 0``,

        katz(v) = Σ_{k=1..max_iter} α^k · walks_k(v)

    where ``walks_k(v)`` counts directed walks of length k ending at v
    (edge multiplicity respected). Converges to the classic Katz vector
    as max_iter → ∞ when α < 1/λ_max. ``normalized=True`` divides by the
    L2 norm (the networkx convention); the raw sum is the default so
    downstream scaling stays explicit.

    Runs on the Pregel machinery: per superstep one src-keyed join
    against the pre-shuffled edge list (dst-state join elided via
    ``requiredSrcColumns``) and one dst-keyed partial-aggregatable sum —
    the same per-iteration shape as pageRank, so the 100 TB posture is
    identical. The L2 normalizer is a 1-row aggregate broadcast back via
    a trivial cross join.
    """
    from graphframes_spark.pregel import Pregel
    from graphframes_spark.util import GraphFramesError

    if not 0.0 < alpha < 1.0:
        raise GraphFramesError(f"katz alpha must be in (0, 1), got {alpha}")
    if max_iter < 1:
        raise GraphFramesError(f"katz maxIter must be >= 1, got {max_iter}")

    pregel = (
        graph.pregel.withVertexColumn(
            "katz", F.lit(0.0), F.coalesce(Pregel.msg(), F.lit(0.0))
        )
        .sendMsgToDst(F.lit(alpha) * (F.lit(1.0) + Pregel.src("katz")))
        .aggMsgs(F.sum(Pregel.msg()))
        .requiredSrcColumns("katz")
        .setMaxIter(max_iter)
        .setCheckpointInterval(5)  # see pagerank.py: short runs stay fused
    )
    result = pregel.run()
    if normalized:
        norm = result.agg(F.sqrt(F.sum(F.col("katz") * F.col("katz"))).alias("_n"))
        result = result.crossJoin(F.broadcast(norm)).select(
            *[c for c in result.columns if c != "katz"],
            F.try_divide(F.col("katz"), F.col("_n")).alias("katz"),
        )
    return result


def eigenvector_centrality(
    graph: "GraphFrame",
    max_iter: int = 10,
    normalized: bool = True,
) -> DataFrame:
    """Truncated eigenvector centrality (power iteration) —
    DF[<vertex columns>, eigenvector: double].

    ``max_iter`` supersteps of ``x ← Aᵀx`` from ``x₀ = 1`` compute

        x_k(v) = walks_k(v)  (directed walks of length k ending at v,
                              edge multiplicity respected),

    the un-normalized power-iteration vector, which converges in
    direction to the principal eigenvector of Aᵀ (Bonacich 1972).
    ``normalized=True`` (default) divides once at the end by the L2
    norm — mathematically identical to the textbook per-iteration
    rescaling (scaling commutes with the linear map) while keeping
    every intermediate value an exact integer count, so results are
    bit-deterministic across partitionings until the final division.

    Same per-superstep shape as :func:`katz_centrality` / pageRank: one
    src-keyed join against the pre-shuffled edge list (dst-state join
    elided via ``requiredSrcColumns``) and one dst-keyed
    partial-aggregatable sum — the 100 TB posture is identical. The L2
    normalizer is a 1-row aggregate broadcast back via a trivial cross
    join. Note truncated walk counts overflow doubles (2^53) faster
    than Katz's α-damped sums; keep max_iter modest (≲ 40 on dense
    graphs) or pass ``normalized=False`` and rescale externally.
    """
    from graphframes_spark.pregel import Pregel
    from graphframes_spark.util import GraphFramesError

    if max_iter < 1:
        raise GraphFramesError(f"eigenvector maxIter must be >= 1, got {max_iter}")

    pregel = (
        graph.pregel.withVertexColumn(
            "eigenvector", F.lit(1.0), F.coalesce(Pregel.msg(), F.lit(0.0))
        )
        .sendMsgToDst(Pregel.src("eigenvector"))
        .aggMsgs(F.sum(Pregel.msg()))
        .requiredSrcColumns("eigenvector")
        .setMaxIter(max_iter)
        .setCheckpointInterval(5)  # see pagerank.py: short runs stay fused
    )
    result = pregel.run()
    if normalized:
        norm = result.agg(
            F.sqrt(F.sum(F.col("eigenvector") * F.col("eigenvector"))).alias("_n")
        )
        result = result.crossJoin(F.broadcast(norm)).select(
            *[c for c in result.columns if c != "eigenvector"],
            F.try_divide(F.col("eigenvector"), F.col("_n")).alias("eigenvector"),
        )
    return result
