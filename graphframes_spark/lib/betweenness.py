"""Landmark-sampled betweenness centrality (Brandes 2001).

Beyond-reference: the reference library has no betweenness operator.
This is the standard source-sampled estimator (Brandes & Pich 2007):
exact Brandes dependency accumulation restricted to a caller-supplied
source set — exact betweenness when ``sources`` is every vertex, an
unbiased n/|S|-scaled sample otherwise (the only form that is tractable
at scale; exact all-pairs betweenness is O(V·E) and no engine changes
that).

Shape: two phases, both BFS-layered driver loops.

1. **Forward** (multi-source BFS with path counting): state rows
   ``(id, s, dist, sigma)`` — one row per (vertex, source) pair
   actually reached, never a per-vertex map, so hub rows stay bounded
   and every aggregation is partial-aggregatable. Each superstep joins
   the frontier with the pre-shuffled edge relation and sums sigma into
   newly-reached (vertex, source) pairs (anti-join against settled).
2. **Backward** (dependency accumulation): the shortest-path DAG
   ``(v, w, s)`` with ``dist(w) = dist(v)+1`` is materialized once by
   re-joining the settled table with the edges, then deltas are rolled
   up layer by layer from the deepest level:

       delta(v,s) = Σ_{w ∈ succ(v,s)} sigma(v,s)/sigma(w,s) · (1 + delta(w,s))

   and betweenness(v) = Σ_s delta(v,s) over v ≠ s.

Both loops run O(diameter) supersteps (bounded by ``max_depth``) with
the shared harness's persist/checkpoint discipline. At 100 TB: the
settled/DAG tables are |S|-proportional (sample size controls memory),
joins shuffle on vertex id only, and no step collects data to the
driver beyond the layer-count probe.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.harness import IterationHarness
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

BETWEENNESS = "betweenness"


def betweenness_centrality(
    graph: "GraphFrame",
    sources: Sequence[Any],
    max_depth: int = 20,
    is_directed: bool = True,
) -> DataFrame:
    """DF[<vertex columns>, betweenness: double].

    ``sources`` is the Brandes sample (all vertices → exact); scale the
    result by n/|sources| for the sampled estimate — the raw dependency
    sum is returned so callers control normalization. ``max_depth``
    bounds both BFS phases (paths longer than it are ignored).
    """
    if not sources:
        raise GraphFramesError("betweenness_centrality needs >= 1 source")
    if max_depth < 1:
        raise GraphFramesError(f"max_depth must be >= 1, got {max_depth}")
    spark = graph.spark
    harness = IterationHarness(spark, checkpoint_interval=2)

    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if not is_directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    edges = harness.pin(e.distinct())

    id_type = dict(graph.vertices.dtypes)[ID]
    src_df = spark.createDataFrame(
        [(s,) for s in sources], f"_s {id_type}"
    ).distinct()

    # ---- forward: (id, s, dist, sigma) for every reached pair
    settled = harness.checkpoint(
        src_df.select(
            F.col("_s").alias(ID),
            F.col("_s"),
            F.lit(0).alias("_dist"),
            F.lit(1.0).alias("_sigma"),
        ),
        eager=True,
    )
    frontier = settled
    depth = 0
    for d in harness.iterations(max_depth):
        msgs = frontier.join(edges, frontier[ID] == edges[SRC]).select(
            F.col(DST).alias(ID), F.col("_s"), F.col("_sigma")
        )
        cand = msgs.groupBy(ID, "_s").agg(F.sum("_sigma").alias("_sigma"))
        new = (
            cand.join(settled.select(ID, "_s"), on=[ID, "_s"], how="left_anti")
            .withColumn("_dist", F.lit(d))
        )
        # one action per layer: the frontier is eagerly checkpointed and
        # the emptiness probe rides it as an Observation. The previous
        # ``persist + isEmpty`` shape executed the join+agg+anti-join
        # pipeline once for the probe (shuffles cannot short-circuit
        # under limit-1) and then again when later actions pulled the
        # rows the probe's partial cache did not cover — measured
        # 0.3-1.3s per layer at sf0.1 on the region-tree fixture.
        from pyspark.sql import Observation

        obs = Observation()
        new = harness.checkpoint(
            new.observe(obs, F.count(F.lit(1)).alias("n")), eager=True
        )
        if (obs.get.get("n") or 0) == 0:
            break
        depth = d
        settled = harness.commit(settled.unionByName(new.select(settled.columns)))
        frontier = new

    if depth == 0:
        # nothing reached: all-zero betweenness
        return graph.vertices.withColumn(BETWEENNESS, F.lit(0.0))

    settled = harness.checkpoint(settled, eager=True)

    # ---- shortest-path DAG: v -> w within one source's BFS tree
    v_side = settled.select(
        F.col(ID).alias("_v"), F.col("_s"), F.col("_dist").alias("_dv"),
        F.col("_sigma").alias("_sv"),
    )
    w_side = settled.select(
        F.col(ID).alias("_w"), F.col("_s"), F.col("_dist").alias("_dw"),
        F.col("_sigma").alias("_sw"),
    )
    dag = harness.pin(
        v_side.join(edges, v_side["_v"] == edges[SRC])
        .join(
            w_side,
            (F.col(DST) == w_side["_w"])
            & (v_side["_s"] == w_side["_s"])
            & (w_side["_dw"] == v_side["_dv"] + 1),
        )
        .select(v_side["_v"], v_side["_s"], v_side["_dv"], v_side["_sv"],
                w_side["_w"], w_side["_sw"])
    )

    # ---- backward: roll deltas up from the deepest layer
    prev_delta = None  # (w, s, delta) rows of layer d+1
    layer_deltas: list[DataFrame] = []
    for d in range(depth - 1, -1, -1):
        layer = dag.filter(F.col("_dv") == d)
        if prev_delta is not None:
            layer = layer.join(
                prev_delta,
                (layer["_w"] == prev_delta["_pw"])
                & (layer["_s"] == prev_delta["_ps"]),
                "left_outer",
            )
            contrib = (F.col("_sv") / F.col("_sw")) * (
                F.lit(1.0) + F.coalesce(F.col("_delta"), F.lit(0.0))
            )
        else:
            contrib = (F.col("_sv") / F.col("_sw")) * F.lit(1.0)
        delta = harness.checkpoint(
            layer.groupBy("_v", "_s").agg(F.sum(contrib).alias("_delta")),
            eager=True,
        )
        layer_deltas.append(delta)
        prev_delta = delta.select(
            F.col("_v").alias("_pw"), F.col("_s").alias("_ps"), F.col("_delta")
        )

    all_deltas = layer_deltas[0]
    for extra in layer_deltas[1:]:
        all_deltas = all_deltas.unionByName(extra)
    bc = (
        all_deltas.filter(F.col("_v") != F.col("_s"))
        .groupBy("_v")
        .agg(F.sum("_delta").alias(BETWEENNESS))
    )
    out = (
        graph.vertices.join(bc, graph.vertices[ID] == bc["_v"], "left_outer")
        .drop("_v")
        .withColumn(BETWEENNESS, F.coalesce(F.col(BETWEENNESS), F.lit(0.0)))
    )
    return harness.finish(out)
