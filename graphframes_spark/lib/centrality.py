"""Landmark-sampled harmonic / closeness centrality.

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
