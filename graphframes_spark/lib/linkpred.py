"""Link-prediction scores: common neighbors and Adamic–Adar.

Beyond-reference (the reference has no link-prediction operator): for
every vertex pair at distance 2 in the undirected neighbor graph —
i.e. sharing at least one neighbor — emit

    common_neighbors(a, b) = |N(a) ∩ N(b)|
    adamic_adar(a, b)      = Σ_{w ∈ N(a) ∩ N(b)} 1 / ln(deg(w))

(Adamic & Adar 2003). Pairs are canonical (``id_a < id_b``); already-
adjacent pairs are included (callers doing link prediction typically
anti-join the edge set — kept separate so the score table is reusable
for similarity search too).

Scale posture: the computation is the wedge enumeration — for each
center ``w``, every pair of its neighbors. A hub of degree d emits
C(d, 2) wedges, the classic quadratic blowup, which NO algorithm that
returns exact per-pair scores can avoid (the output itself is that
large). Two mitigations, both standard: AQE skew-splitting of the wedge
self-join (same key both sides), and ``max_degree`` to drop super-hub
centers entirely (a hub shared by millions contributes ~1/ln(d) ≈ 0
per pair anyway — dropping it barely moves the score and removes the
d² wedges). The groupBy is partial-aggregatable (count + sum).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

ID_A = "id_a"
ID_B = "id_b"


def common_neighbor_scores(
    graph: "GraphFrame",
    max_degree: Optional[int] = None,
    include_jaccard: bool = False,
) -> DataFrame:
    """DF[id_a, id_b, common_neighbors: long, adamic_adar: double
    [, jaccard: double]].

    ``include_jaccard`` adds ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` via two
    broadcast-friendly joins against the (uncapped) degree table — the
    union size is ``deg(a) + deg(b) - cn``, no second enumeration."""
    if max_degree is not None and max_degree < 2:
        raise GraphFramesError("max_degree must be >= 2 (a wedge needs 2 neighbors)")
    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    und = e.unionByName(
        e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    ).distinct()
    # degree of the wedge center = its distinct undirected neighbor count
    deg = und.groupBy(SRC).agg(F.count(F.lit(1)).alias("_deg"))
    centers_deg = (
        deg if max_degree is None else deg.filter(F.col("_deg") <= max_degree)
    )
    centers = und.join(centers_deg, on=SRC)
    left = centers.select(
        F.col(SRC).alias("_w"), F.col(DST).alias(ID_A), F.col("_deg")
    )
    right = und.select(F.col(SRC).alias("_w"), F.col(DST).alias(ID_B))
    wedges = left.join(right, on="_w").filter(F.col(ID_A) < F.col(ID_B))
    scores = wedges.groupBy(ID_A, ID_B).agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("_deg"))).alias("adamic_adar"),
    )
    if not include_jaccard:
        return scores
    deg_a = deg.select(F.col(SRC).alias(ID_A), F.col("_deg").alias("_deg_a"))
    deg_b = deg.select(F.col(SRC).alias(ID_B), F.col("_deg").alias("_deg_b"))
    return (
        scores.join(deg_a, on=ID_A)
        .join(deg_b, on=ID_B)
        .withColumn(
            "jaccard",
            F.col("common_neighbors")
            / (F.col("_deg_a") + F.col("_deg_b") - F.col("common_neighbors")),
        )
        .drop("_deg_a", "_deg_b")
        .select(ID_A, ID_B, "common_neighbors", "adamic_adar", "jaccard")
    )
