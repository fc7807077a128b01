"""Graph-level summary metrics: degree assortativity, modularity,
global transitivity, and reciprocity.

Beyond-reference (the reference library computes no whole-graph
statistics): both are single-row corpus/graph health numbers a pipeline
operator wants before and after community detection or dedup-by-CC —
"is this graph hub-attracted or hub-avoidant?" (assortativity) and
"how good is this partition?" (modularity of LPA/CC output).

Scale posture: both reduce to one or two hash-aggregations over the
edge list joined with a degree table — no iteration, no windows, no
driver-side data. The degree table is vertex-sized; joining it onto
edges twice is the same shape every Pregel superstep already has. At
100 TB the joins shuffle on src/dst exactly once each and the final
aggregate is a 1-row partial-aggregatable reduction.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame


def _symmetrized(graph: "GraphFrame") -> DataFrame:
    """Distinct undirected neighbor pairs, both orientations, no loops."""
    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    return e.unionByName(
        e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    ).distinct()


def describe(graph: "GraphFrame") -> DataFrame:
    """1-row graph summary — the numbers a pipeline logs before and
    after every transformation:

    ``n_vertices, n_edges, n_distinct_edges, n_self_loops, n_isolated,
    density, avg_out_degree, max_out_degree, max_in_degree``

    ``density`` = distinct non-loop directed edges / (n·(n−1)); NULL on
    graphs with < 2 vertices. Everything reduces to one pass over the
    edge list (degree aggregation + 1-row rollups) and one vertex
    anti-join for the isolated count — no iteration, partial-
    aggregatable throughout.
    """
    v_cnt = graph.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))
    e = graph.edges.select(SRC, DST)
    e_stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.count_if(F.col(SRC) == F.col(DST)).alias("n_self_loops"),
    )
    distinct_e = (
        e.filter(F.col(SRC) != F.col(DST))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_distinct_edges"))
    )
    ends = e.select(F.explode(F.array(SRC, DST)).alias(ID)).distinct()
    isolated = (
        graph.vertices.select(ID)
        .join(ends, on=ID, how="left_anti")
        .agg(F.count(F.lit(1)).alias("n_isolated"))
    )
    out_deg = (
        e.groupBy(SRC)
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.max("_d").alias("max_out_degree"))
    )
    in_deg = (
        e.groupBy(DST)
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.max("_d").alias("max_in_degree"))
    )
    n = F.col("n_vertices").cast("double")
    return (
        v_cnt.crossJoin(e_stats)
        .crossJoin(distinct_e)
        .crossJoin(isolated)
        .crossJoin(out_deg)
        .crossJoin(in_deg)
        .select(
            "n_vertices",
            "n_edges",
            "n_distinct_edges",
            "n_self_loops",
            "n_isolated",
            F.try_divide(
                F.col("n_distinct_edges").cast("double"), n * (n - 1)
            ).alias("density"),
            F.try_divide(F.col("n_edges").cast("double"), n).alias(
                "avg_out_degree"
            ),
            F.coalesce(F.col("max_out_degree"), F.lit(0)).alias("max_out_degree"),
            F.coalesce(F.col("max_in_degree"), F.lit(0)).alias("max_in_degree"),
        )
    )


def degree_assortativity(graph: "GraphFrame", mode: str = "total") -> DataFrame:
    """DF[assortativity: double] — Newman (2002) degree correlation.

    Pearson correlation of endpoint degrees over the symmetrized edge
    list (each undirected edge contributes both orientations, which is
    exactly Newman's sum over edge "ends"). ``mode``:

    - ``"total"``: undirected — symmetrize, correlate total degree.
    - ``"out-in"``: directed — correlate src out-degree with dst
      in-degree over the directed edges.

    r > 0: hubs attach to hubs (social nets); r < 0: hubs attach to
    leaves (stars, the web). NaN when all degrees are equal (zero
    variance — e.g. cliques, cycles).
    """
    if mode == "total":
        und = _symmetrized(graph)
        deg = und.groupBy(SRC).agg(F.count(F.lit(1)).alias("_deg"))
        joined = (
            und.join(deg.select(F.col(SRC), F.col("_deg").alias("_dsrc")), on=SRC)
            .join(
                deg.select(F.col(SRC).alias(DST), F.col("_deg").alias("_ddst")),
                on=DST,
            )
        )
    elif mode == "out-in":
        e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
        outd = e.groupBy(SRC).agg(F.count(F.lit(1)).alias("_dsrc"))
        ind = e.groupBy(DST).agg(F.count(F.lit(1)).alias("_ddst"))
        joined = e.join(outd, on=SRC).join(ind, on=DST)
    else:
        raise GraphFramesError(f"unknown assortativity mode: {mode!r}")
    # Pearson r via population moments with try_divide: Spark 4's ANSI
    # mode makes corr() raise DIVIDE_BY_ZERO on zero-variance input
    # (regular graphs); NULL is the contract instead
    x = F.col("_dsrc").cast("double")
    y = F.col("_ddst").cast("double")
    return joined.agg(
        F.try_divide(
            F.covar_pop(x, y), F.stddev_pop(x) * F.stddev_pop(y)
        ).alias("assortativity")
    )


def modularity(
    graph: "GraphFrame",
    assignment: DataFrame,
    community_col: str = "community",
    weight_col: Optional[str] = None,
) -> DataFrame:
    """DF[modularity: double] — Newman–Girvan modularity of a partition.

    ``assignment`` is DF[id, <community_col>] (e.g. labelPropagation,
    connectedComponents, or louvain output). Undirected semantics: the
    graph is symmetrized and de-duplicated; self-loops are dropped.
    ``weight_col`` switches to weighted modularity (parallel edges sum;
    the quantity louvain(weightCol=...) optimizes):

        Q = Σ_c ( W_c / m  −  (s_c / 2m)² )

    with m = total undirected weight, W_c = weight inside community c,
    s_c = total weighted degree (strength) in c. Computed as two
    aggregates over the strength-annotated symmetrized edges — the
    per-community terms are partial-aggregatable, and the community
    count is bounded by the vertex count, never materialized on the
    driver.
    """
    if community_col not in assignment.columns:
        raise GraphFramesError(
            f"assignment is missing community column {community_col!r}"
        )
    if weight_col is not None and weight_col not in graph.edges.columns:
        raise GraphFramesError(f"edges have no weight column {weight_col!r}")
    # canonical one-row-per-undirected-pair view for m and W_c.
    # Unweighted: distinct pairs at weight 1 (orientation multiplicity
    # ignored — the original contract). Weighted: parallel edges and
    # both orientations SUM (louvain's _canonical_edges semantics).
    if weight_col is None:
        canon = (
            graph.edges.select(
                F.least(F.col(SRC), F.col(DST)).alias(SRC),
                F.greatest(F.col(SRC), F.col(DST)).alias(DST),
            )
            .filter(F.col(SRC) != F.col(DST))
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        canon = (
            graph.edges.select(
                F.least(F.col(SRC), F.col(DST)).alias(SRC),
                F.greatest(F.col(SRC), F.col(DST)).alias(DST),
                F.col(weight_col).cast("double").alias("_w"),
            )
            .filter(F.col(SRC) != F.col(DST))
            .groupBy(SRC, DST)
            .agg(F.sum("_w").alias("_w"))
        )
    a_src = assignment.select(
        F.col(ID).alias(SRC), F.col(community_col).alias("_csrc")
    )
    a_dst = assignment.select(
        F.col(ID).alias(DST), F.col(community_col).alias("_cdst")
    )
    m = canon.agg(F.sum("_w")).collect()[0][0]
    if m is None or m <= 0.0:
        spark = graph.spark
        return spark.createDataFrame([(float("nan"),)], "modularity double")
    intra = (
        canon.join(a_src, on=SRC)
        .join(a_dst, on=DST)
        .filter(F.col("_csrc") == F.col("_cdst"))
        .groupBy("_csrc")
        .agg(F.sum("_w").alias("_lc"))
    )
    und = canon.select(SRC, "_w").unionByName(
        canon.select(F.col(DST).alias(SRC), "_w")
    )
    deg = und.groupBy(SRC).agg(F.sum("_w").alias("_deg"))
    comm_deg = (
        deg.join(a_src, on=SRC)
        .groupBy("_csrc")
        .agg(F.sum("_deg").alias("_dc"))
    )
    per_comm = comm_deg.join(intra, on="_csrc", how="left_outer").select(
        (
            F.coalesce(F.col("_lc"), F.lit(0.0)) / F.lit(float(m))
            - (F.col("_dc") / F.lit(2.0 * m)) * (F.col("_dc") / F.lit(2.0 * m))
        ).alias("_q")
    )
    return per_comm.agg(F.sum("_q").alias("modularity"))


def attribute_assortativity(
    graph: "GraphFrame", attr_col: str
) -> DataFrame:
    """DF[assortativity: double] — Newman (2003) nominal assortativity
    by a categorical vertex attribute (language, community, type...).

        r = (tr(e) − Σ_i a_i²) / (1 − Σ_i a_i²)

    over the symmetrized edge mixing matrix e (e_ij = fraction of edge
    ends joining category i to j, a = row marginals). r=1: edges only
    within categories; r=0: random mixing; r<0: disassortative
    (cross-category) mixing. NULL when every edge end falls in one
    category (denominator 0).

    Two hash aggregations over the attribute-annotated symmetrized
    edges (trace fraction + marginal squares) cross-joined as 1-row
    scalars — no iteration, no per-category state beyond the aggregate.
    """
    if attr_col not in graph.vertices.columns:
        raise GraphFramesError(f"vertices have no attribute column {attr_col!r}")
    und = _symmetrized(graph)
    attr = graph.vertices.select(F.col(ID), F.col(attr_col).alias("_attr"))
    annotated = und.join(
        attr.select(F.col(ID).alias(SRC), F.col("_attr").alias("_asrc")), on=SRC
    ).join(
        attr.select(F.col(ID).alias(DST), F.col("_attr").alias("_adst")), on=DST
    )
    totals = annotated.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_if(F.col("_asrc").eqNullSafe(F.col("_adst"))).alias("_tr"),
    )
    # squares in double: category counts can reach 10^12 ends at 100 TB,
    # whose square overflows a long
    cnt_d = F.count(F.lit(1)).cast("double")
    sum_sq = (
        annotated.groupBy("_asrc")
        .agg(cnt_d.alias("_cnt"))
        .agg(F.sum(F.col("_cnt") * F.col("_cnt")).alias("_ss"))
    )
    n_d = F.col("_n").cast("double")
    return totals.crossJoin(sum_sq).select(
        F.try_divide(
            F.col("_tr") / n_d - F.col("_ss") / (n_d * n_d),
            F.lit(1.0) - F.col("_ss") / (n_d * n_d),
        ).alias("assortativity")
    )


def transitivity(graph: "GraphFrame") -> DataFrame:
    """DF[transitivity: double] — global clustering coefficient.

    ``3 * triangles / wedges`` on the canonical undirected simple graph,
    where wedges = Σ_v d(v)·(d(v)−1)/2 over distinct-neighbor degrees.
    NULL on wedge-free graphs (matchings, isolated vertices).

    Reuses the compact-forward triangle plan
    (:mod:`graphframes_spark.lib.triangle_count`), so the heavy step is
    the same degree-oriented wedge join triangleCount already runs; the
    wedge total is one extra vertex-sized aggregation. Both reductions
    are partial-aggregatable 1-row results, cross-joined (1×1, trivially
    broadcast) into the final ratio.
    """
    from graphframes_spark.lib.triangle_count import _triangle_rows

    tri_total = _triangle_rows(graph).agg(F.count(F.lit(1)).alias("_tri"))
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .distinct()
    )
    wedge_total = (
        edges.select(F.explode(F.array(SRC, DST)).alias(ID))
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("_deg"))
        .agg(F.sum(F.col("_deg") * (F.col("_deg") - 1) / F.lit(2)).alias("_wedges"))
    )
    return tri_total.crossJoin(wedge_total).select(
        F.try_divide(F.lit(3.0) * F.col("_tri"), F.col("_wedges")).alias(
            "transitivity"
        )
    )


def reciprocity(graph: "GraphFrame") -> DataFrame:
    """DF[reciprocity: double] — fraction of distinct directed non-loop
    edges (u, v) whose reverse (v, u) is also present. 1.0 for symmetric
    graphs, 0.0 for DAGs; NULL on edge-free graphs.

    One self-semi-join of the deduplicated edge list on the reversed key
    — shuffles the edge list twice on (src, dst) and reduces to two
    1-row partial aggregates. No vertex state, no iteration.
    """
    e = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    mutual = e.join(rev, on=[SRC, DST], how="left_semi").agg(
        F.count(F.lit(1)).alias("_mutual")
    )
    total = e.agg(F.count(F.lit(1)).alias("_total"))
    return mutual.crossJoin(total).select(
        F.try_divide(F.col("_mutual").cast("double"), F.col("_total")).alias(
            "reciprocity"
        )
    )


def triad_census(graph: "GraphFrame") -> DataFrame:
    """DF one row [mutual_dyads, asym_dyads, null_dyads, cyclic_triangles,
    transitive_triangles] — the directed dyad census (Holland–Leinhardt
    MAN counts) plus the two classic labeled-triangle counts:

    - ``cyclic_triangles``: distinct directed 3-cycles a→b→c→a (each
      cycle counted once, not 3× per rotation; a fully reciprocal
      triangle contains two — one per direction).
    - ``transitive_triangles``: ordered triples (a, b, c) with a→b, b→c
      and the shortcut a→c — the transitivity configurations.

    Works on the deduplicated loop-free directed edge set (multigraph
    edge multiplicity is intentionally ignored, as in the dyad/triad
    census literature). Dyads: one reversed self-semi-join (same shape
    as :func:`reciprocity`); triangles: one two-hop path join closed
    against the edge list — the same cost class as triangleCount, with
    the smaller side of each join broadcast-eligible under AQE. All
    reductions are 1-row partial aggregates cross-joined at the end
    (1×1 broadcasts), so the 100 TB posture equals triangle counting.
    Null dyads are derived as C(n,2) − mutual − asym from the vertex
    count, not enumerated.
    """
    v_total = graph.vertices.select(ID).distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    # directed edge pair counts: mutual dyads have both orientations
    mutual = e.join(rev, on=[SRC, DST], how="left_semi").agg(
        F.floor(F.count(F.lit(1)) / 2).alias("_mutual")
    )
    total_e = e.agg(F.count(F.lit(1)).alias("_edges"))

    ab = e.select(F.col(SRC).alias("_a"), F.col(DST).alias("_b"))
    bc = e.select(F.col(SRC).alias("_b"), F.col(DST).alias("_c"))
    ca = e.select(F.col(SRC).alias("_c"), F.col(DST).alias("_a"))
    ac = e.select(F.col(SRC).alias("_a"), F.col(DST).alias("_c"))
    two_hop = ab.join(bc, "_b").filter(F.col("_a") != F.col("_c"))
    cyclic = two_hop.join(ca, ["_c", "_a"]).agg(
        F.floor(F.count(F.lit(1)) / 3).alias("_cyclic")
    )
    transitive = two_hop.join(ac, ["_a", "_c"]).agg(
        F.count(F.lit(1)).alias("_transitive")
    )

    return (
        v_total.crossJoin(mutual)
        .crossJoin(total_e)
        .crossJoin(cyclic)
        .crossJoin(transitive)
        .select(
            F.col("_mutual").cast("long").alias("mutual_dyads"),
            (F.col("_edges") - F.lit(2) * F.col("_mutual"))
            .cast("long")
            .alias("asym_dyads"),
            (
                F.col("_n") * (F.col("_n") - 1) / 2
                - (F.col("_edges") - F.col("_mutual"))
            )
            .cast("long")
            .alias("null_dyads"),
            F.col("_cyclic").cast("long").alias("cyclic_triangles"),
            F.col("_transitive").cast("long").alias("transitive_triangles"),
        )
    )
