"""Exact per-vertex triangle counting via degree-ordered wedge joins.

Semantics match the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/TriangleCount.scala:41-203):
canonicalize to an undirected simple graph (orient src<dst, dedup, drop
self-loops), then count the triangles each vertex participates in.

Re-architected from the reference's neighbor-set intersection
(TriangleCount.scala:161-179, ``collect_set`` + ``array_intersect``) for
scale: a 10^7-degree hub would materialize a 10^7-element set in a
single row and intersect it on a single task. Here we use the classic
degree-ordered orientation (compact-forward): orient every canonical
edge from its lower-(degree, id) endpoint to the higher one, enumerate
wedges by self-joining the oriented edges on their low endpoint, and
close each wedge with an equi-join against the canonical edge set. Every
operator is a plain join or count — AQE can split skewed build sides,
work is O(m^1.5) total, and no row ever holds more than three ids.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

COUNT_ID = "count"


def approx_triangle_count(graph: "GraphFrame", lg_nom_entries: int = 12) -> DataFrame:
    """Approximate per-vertex triangle count via DataSketches theta
    sketches (TriangleCount.scala:110-133): each vertex's neighbor set is
    a theta sketch; per canonical edge the common-neighbor count is
    ``theta_sketch_estimate(theta_intersection(...))``. Trades exactness
    for bounded per-row state (sketch size 2^lg_nom_entries), so hub
    vertices cannot OOM regardless of degree. Requires Spark >= 4.1.
    """
    from graphframes_spark.util import GraphFramesError

    spark = graph.spark
    if spark.version[:3] < "4.1":
        raise GraphFramesError(
            f"approx triangle count requires Spark >= 4.1 (got {spark.version})"
        )
    if not (4 <= lg_nom_entries <= 24):
        raise GraphFramesError("lg_nom_entries must be between 4 and 24")

    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )
    nbr_sketches = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(SRC).alias(ID), F.col(DST).alias("nbr")),
                    F.struct(F.col(DST).alias(ID), F.col(SRC).alias("nbr")),
                )
            ).alias("p")
        )
        .select("p.id", "p.nbr")
        .groupBy(ID)
        .agg(F.expr(f"theta_sketch_agg(nbr, {lg_nom_entries})").alias("sk"))
    )
    edge_counts = (
        edges.join(nbr_sketches.select(F.col(ID).alias(SRC), F.col("sk").alias("src_sk")), on=SRC)
        .join(nbr_sketches.select(F.col(ID).alias(DST), F.col("sk").alias("dst_sk")), on=DST)
        .withColumn(
            "common",
            F.expr("theta_sketch_estimate(theta_intersection(src_sk, dst_sk))"),
        )
        .filter(F.col("common") > 0)
    )
    per_vertex = (
        edge_counts.select(
            F.explode(
                F.array(
                    F.struct(F.col(SRC).alias(ID), F.col("common")),
                    F.struct(F.col(DST).alias(ID), F.col("common")),
                )
            ).alias("p")
        )
        .select("p.id", "p.common")
        .groupBy(ID)
        .agg(F.floor(F.sum("common") / 2).alias(COUNT_ID))
    )
    return (
        graph.vertices.join(per_vertex, on=ID, how="left_outer")
        .withColumn(COUNT_ID, F.coalesce(F.col(COUNT_ID), F.lit(0)).cast("long"))
        .select(COUNT_ID, *graph.vertices.columns)
    )


def _triangle_rows(graph: "GraphFrame") -> DataFrame:
    """Every triangle of the canonical undirected simple graph, exactly
    once, as (lo, _v, _w) — lo is the lowest-(degree, id) corner."""
    # canonical undirected simple edges: src < dst
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )

    deg = (
        edges.select(F.explode(F.array(SRC, DST)).alias(ID))
        .groupBy(ID)
        .agg(F.count("*").alias("_deg"))
    )

    # orient each canonical edge low -> high by (degree, id); every wedge is
    # then generated exactly once, at its lowest-degree corner
    with_deg = (
        edges.join(deg.select(F.col(ID).alias(SRC), F.col("_deg").alias("_dsrc")), on=SRC)
        .join(deg.select(F.col(ID).alias(DST), F.col("_deg").alias("_ddst")), on=DST)
    )
    src_first = (F.col("_dsrc") < F.col("_ddst")) | (
        (F.col("_dsrc") == F.col("_ddst")) & (F.col(SRC) < F.col(DST))
    )
    oriented = with_deg.select(
        F.when(src_first, F.col(SRC)).otherwise(F.col(DST)).alias("lo"),
        F.when(src_first, F.col(DST)).otherwise(F.col(SRC)).alias("hi"),
    )

    # wedges (lo, v, w) with v < w by id; closed by a canonical edge (v, w)
    o1 = oriented.select(F.col("lo"), F.col("hi").alias("_v"))
    o2 = oriented.select(F.col("lo"), F.col("hi").alias("_w"))
    wedges = o1.join(o2, on="lo").filter(F.col("_v") < F.col("_w"))
    return wedges.join(
        edges,
        (wedges["_v"] == edges[SRC]) & (wedges["_w"] == edges[DST]),
        "left_semi",
    )


def enumerate_triangles(graph: "GraphFrame") -> DataFrame:
    """All triangles of the canonical undirected simple graph, one row
    each — DF[a, b, c] with a < b < c. Beyond-reference (the reference
    only counts); same compact-forward plan as triangleCount, so hub
    rows never hold more than three ids and AQE splits skewed wedge
    corners."""
    tri = _triangle_rows(graph).select(
        F.array_sort(F.array(F.col("lo"), F.col("_v"), F.col("_w"))).alias("_t")
    )
    return tri.select(
        F.col("_t")[0].alias("a"),
        F.col("_t")[1].alias("b"),
        F.col("_t")[2].alias("c"),
    )


def triangle_count(graph: "GraphFrame") -> DataFrame:
    triangles = _triangle_rows(graph)

    per_vertex = (
        triangles.select(
            F.explode(F.array(F.col("lo"), F.col("_v"), F.col("_w"))).alias(ID)
        )
        .groupBy(ID)
        .agg(F.count("*").alias(COUNT_ID))
    )

    return (
        graph.vertices.join(per_vertex, on=ID, how="left_outer")
        .withColumn(COUNT_ID, F.coalesce(F.col(COUNT_ID), F.lit(0)).cast("long"))
        .select(COUNT_ID, *graph.vertices.columns)
    )


def clustering_coefficient(graph: "GraphFrame") -> DataFrame:
    """Local clustering coefficient per vertex:
    ``2·T(v) / (d(v)·(d(v)−1))`` on the canonical undirected simple
    graph (T = triangle_count, d = distinct-neighbor degree); vertices
    with degree < 2 score 0.0. Beyond-reference — derived entirely from
    the compact-forward triangle machinery above, adding only the
    degree join and one arithmetic projection."""
    tri = triangle_count(graph)
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )
    deg = (
        edges.select(F.explode(F.array(SRC, DST)).alias(ID))
        .groupBy(ID)
        .agg(F.count("*").alias("_deg"))
    )
    return (
        tri.join(deg, on=ID, how="left_outer")
        .withColumn(
            "coefficient",
            F.when(
                F.col("_deg") >= 2,
                F.lit(2.0)
                * F.col(COUNT_ID)
                / (F.col("_deg") * (F.col("_deg") - F.lit(1))),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_deg")
        .select(*graph.vertices.columns, COUNT_ID, "coefficient")
    )


def ktruss(graph: "GraphFrame", k: int) -> DataFrame:
    """Edges of the k-truss: the maximal subgraph of the canonical
    undirected simple graph in which every edge participates in at
    least ``k - 2`` triangles. DF[src, dst, support] (src < dst;
    support = triangle count within the truss itself).

    Beyond-reference. Peeling loop: enumerate triangles with the same
    degree-ordered compact-forward join as ``triangle_count``, explode
    each into its three edges, count per-edge support
    (partial-aggregatable), drop edges below threshold, repeat until no
    edge is dropped — support only decreases as edges leave, so the
    cascade converges to the unique fixpoint. Each round is bounded by
    one triangle enumeration; the edge set shrinks monotonically and is
    checkpointed per round to keep lineage flat.
    """
    from graphframes_spark.harness import IterationHarness
    from graphframes_spark.util import GraphFramesError

    if k < 3:
        raise GraphFramesError("kTruss requires k >= 3 (k-2 >= 1 triangle per edge)")
    min_support = k - 2
    harness = IterationHarness(graph.spark, checkpoint_interval=1)

    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )
    edges = harness.checkpoint(edges, eager=True)
    n_edges = edges.count()

    supported = edges.limit(0).withColumn("support", F.lit(0).cast("long"))
    while n_edges > 0:
        deg = (
            edges.select(F.explode(F.array(SRC, DST)).alias(ID))
            .groupBy(ID)
            .agg(F.count("*").alias("_deg"))
        )
        with_deg = edges.join(
            deg.select(F.col(ID).alias(SRC), F.col("_deg").alias("_dsrc")), on=SRC
        ).join(deg.select(F.col(ID).alias(DST), F.col("_deg").alias("_ddst")), on=DST)
        src_first = (F.col("_dsrc") < F.col("_ddst")) | (
            (F.col("_dsrc") == F.col("_ddst")) & (F.col(SRC) < F.col(DST))
        )
        oriented = with_deg.select(
            F.when(src_first, F.col(SRC)).otherwise(F.col(DST)).alias("lo"),
            F.when(src_first, F.col(DST)).otherwise(F.col(SRC)).alias("hi"),
        )
        o1 = oriented.select(F.col("lo"), F.col("hi").alias("_v"))
        o2 = oriented.select(F.col("lo"), F.col("hi").alias("_w"))
        wedges = o1.join(o2, on="lo").filter(F.col("_v") < F.col("_w"))
        triangles = wedges.join(
            edges,
            (wedges["_v"] == edges[SRC]) & (wedges["_w"] == edges[DST]),
            "left_semi",
        )
        # each triangle (lo, v, w) supports its three canonical edges
        tri_edges = triangles.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("lo", "_v").alias(SRC),
                        F.greatest("lo", "_v").alias(DST),
                    ),
                    F.struct(
                        F.least("lo", "_w").alias(SRC),
                        F.greatest("lo", "_w").alias(DST),
                    ),
                    F.struct(F.col("_v").alias(SRC), F.col("_w").alias(DST)),
                )
            ).alias("_e")
        ).select("_e.*")
        support = tri_edges.groupBy(SRC, DST).agg(F.count("*").alias("support"))
        supported = harness.checkpoint(
            edges.join(support, on=[SRC, DST], how="left_outer").withColumn(
                "support", F.coalesce(F.col("support"), F.lit(0)).cast("long")
            ),
            eager=True,
        )
        kept = supported.filter(F.col("support") >= min_support)
        n_kept = kept.count()
        if n_kept == n_edges:
            break
        edges = harness.checkpoint(kept.select(SRC, DST), eager=True)
        n_edges = n_kept
        harness.rotate()

    result = supported.filter(F.col("support") >= min_support)
    if n_edges == 0:
        result = supported.limit(0)
    return harness.finish(result)
