"""Weisfeiler-Leman vertex refinement labels (1-WL color refinement).

Beyond-reference: iterative neighborhood hashing — the structural
fingerprint behind graph-isomorphism screening, WL graph kernels
(Shervashidze et al., JMLR 2011) and GNN expressiveness analysis. In a
data pipeline it dedups/partitions *structures* (parse trees, API call
graphs, molecule graphs) the way MinHash dedups documents: two vertices
(or graphs, via their label histograms) that differ get different labels
with high probability after a few refinement rounds.

Label definition (engine-portable, md5-based like every deterministic
hash in this repo — xxhash64 has no DuckDB twin, md5 does):

    c_0(v)    = md5(in_deg ':' out_deg)
    h(c)      = first 12 hex chars of c as a 48-bit integer
    c_{t+1}(v) = md5(c_t(v) '|' Σ_in h ':' |in| '|' Σ_out h ':' |out|)

The classic WL step hashes the SORTED neighbor-label multiset —
per-vertex state that grows with degree and dies on 10^8-degree hubs.
Here the multiset is summarized by (sum of 48-bit label hashes, count)
per direction: commutative, fully partial-aggregatable (map-side
combine), bounded per-row state. The trade is a slightly weaker
separator than sorted concatenation (sum collisions), mitigated by
running more rounds; for fingerprinting this is the standard
scale-safe substitution.

Per round: two edge⋈state joins (in- and out-gather as one tagged
union) + one hash aggregate + one vertex-sized left join — the same
shape as a Pregel superstep; state is local-checkpointed per round.
The per-direction sums run in decimal(38,0): 48-bit labels overflow a
long at hub degree ~3×10^4 (ANSI mode raises), while decimal-128 holds
to degree ~10^23 and renders digit-identically to the DuckDB oracle's
hugeint.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.util import DST, ID, SRC, GraphFramesError

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

WL_LABEL = "wl_label"
_HEX_CHARS = 12  # 48-bit arithmetic fingerprint of a label


def _h(c: Column) -> Column:
    return F.conv(F.substring(c, 1, _HEX_CHARS), 16, 10).cast("long")


def wl_labels(graph: "GraphFrame", iterations: int = 2) -> DataFrame:
    """DF[id, wl_label: hex string] after ``iterations`` refinement
    rounds (0 = degree-pair labels only). Vertices with identical
    ``iterations``-hop neighborhood structure share a label; a
    ``groupBy(wl_label)`` histogram is the whole-graph fingerprint."""
    if iterations < 0:
        raise GraphFramesError(f"wl iterations must be >= 0, got {iterations}")

    e = graph.edges.select(SRC, DST)
    ind = e.groupBy(F.col(DST).alias(ID)).agg(F.count(F.lit(1)).alias("_in"))
    outd = e.groupBy(F.col(SRC).alias(ID)).agg(F.count(F.lit(1)).alias("_out"))
    state = (
        graph.vertices.select(ID)
        .join(ind, on=ID, how="left")
        .join(outd, on=ID, how="left")
        .select(
            ID,
            F.md5(
                F.concat_ws(
                    ":",
                    F.coalesce(F.col("_in"), F.lit(0)),
                    F.coalesce(F.col("_out"), F.lit(0)),
                )
            ).alias(WL_LABEL),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(iterations):
        hashed = state.select(ID, WL_LABEL, _h(F.col(WL_LABEL)).alias("_hh"))
        gather_in = e.join(
            hashed.select(F.col(ID).alias(SRC), F.col("_hh")), on=SRC
        ).select(F.col(DST).alias(ID), "_hh", F.lit("i").alias("_d"))
        gather_out = e.join(
            hashed.select(F.col(ID).alias(DST), F.col("_hh")), on=DST
        ).select(F.col(SRC).alias(ID), "_hh", F.lit("o").alias("_d"))
        # decimal(38,0) sums: a 10^5-degree hub already overflows a long
        # at 48 bits/label (caught by test_skew.py); decimal is still a
        # partial-aggregatable sum and renders digit-identically to the
        # oracle's hugeint
        dec = "decimal(38,0)"
        agg = (
            gather_in.unionByName(gather_out)
            .groupBy(ID)
            .agg(
                F.sum(
                    F.when(F.col("_d") == "i", F.col("_hh")).cast(dec)
                ).alias("_is"),
                F.count_if(F.col("_d") == "i").alias("_ic"),
                F.sum(
                    F.when(F.col("_d") == "o", F.col("_hh")).cast(dec)
                ).alias("_os"),
                F.count_if(F.col("_d") == "o").alias("_oc"),
            )
        )
        state = (
            state.join(agg, on=ID, how="left")
            .select(
                ID,
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col(WL_LABEL),
                        F.concat_ws(
                            ":",
                            F.coalesce(F.col("_is"), F.lit(0)),
                            F.coalesce(F.col("_ic"), F.lit(0)),
                        ),
                        F.concat_ws(
                            ":",
                            F.coalesce(F.col("_os"), F.lit(0)),
                            F.coalesce(F.col("_oc"), F.lit(0)),
                        ),
                    )
                ).alias(WL_LABEL),
            )
            .localCheckpoint(eager=True)
        )
    return state
