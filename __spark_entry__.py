"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator from SURVEY.md §2 (or the
LLM-data-pipeline tier) on views derived from the driver's TPC-H-ish
testdata (TESTDATA.md), and the matching ``oracle_sql()`` entry
reproduces the exact semantics in DuckDB SQL. Column names and types are
aligned on both sides so the driver's row-count + schema + value-hash
comparison passes. Cross-engine-stable primitives only (md5/sha256,
lexicographic mins, integer bit ops) — no xxhash64 in oracled paths.

Graph views used (FIXTURES.md §6):
- customer–order bipartite: v = custkeys ∪ (orderkeys + 10^7),
  e = (custkey → orderkey + 10^7)
- nation adjacency: nations fully connected within a region (directed
  both ways, no self-loops); canonical (src<dst) variant for undirected
  algorithms
- events chain: consecutive events per user ordered by (ts, event_id);
  capped user cycles (first 8 events + wrap-around) for SCC/cycles
- documents / embeddings: LLM-pipeline tier
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphframes_spark import GraphFrame

ORDER_OFFSET = 10_000_000
PART_OFFSET = 20_000_000
CYCLE_CAP = 8

NUM_PERM = 32
NUM_BANDS = 8
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
JACCARD_T = 0.8
COSINE_T = 0.45
HAMMING_T = 1


# --------------------------------------------------------------------- views


def _customer_order_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        orders.select((F.col("o_orderkey") + ORDER_OFFSET).alias("id"))
    )
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        F.col("o_totalprice"),
    )
    return GraphFrame(v, e)


def _nation_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    v = nation.select(F.col("n_nationkey").alias("id"))
    n1 = nation.select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r1")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r2")
    )
    e = (
        n1.join(n2, F.col("r1") == F.col("r2"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    return GraphFrame(v, e)


def _nation_canon_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    """Each undirected within-region edge exactly once (src < dst)."""
    g = _nation_graph(spark, sf_dir)
    return GraphFrame(g.vertices, g.edges.filter(F.col("src") < F.col("dst")))


_NATION_EDGES_SQL = """
    SELECT a.n_nationkey AS src, b.n_nationkey AS dst
    FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
    WHERE a.n_nationkey <> b.n_nationkey
"""


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS); read as long (ordering is
    # identical, which is all the chain view needs)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _events_chain_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    events = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = events.select(
        F.col("event_id").alias("src"),
        F.lead("event_id").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    v = events.select(F.col("event_id").alias("id"))
    return GraphFrame(v, nxt)


_EVENTS_CHAIN_SQL = """
    SELECT event_id AS src,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
    QUALIFY dst IS NOT NULL
"""


def _user_cycles_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    """Per user: first CYCLE_CAP events chained + wrap-around edge — one
    directed cycle per user."""
    events = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_id", "user_id", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= CYCLE_CAP)
    wu = Window.partitionBy("user_id")
    ring = seq.withColumn("n", F.max("rn").over(wu))
    nxt = ring.select(
        F.col("event_id").alias("src"),
        F.col("user_id"),
        (F.col("rn") % F.col("n") + 1).alias("next_rn"),
    )
    e = nxt.join(
        ring.select(
            F.col("event_id").alias("dst"),
            F.col("user_id"),
            F.col("rn").alias("next_rn"),
        ),
        on=["user_id", "next_rn"],
    ).select("src", "dst")
    v = seq.select(F.col("event_id").alias("id"))
    return GraphFrame(v, e)


_USER_CYCLES_SQL = f"""
    SELECT event_id, user_id, rn, max(rn) OVER (PARTITION BY user_id) AS n
    FROM (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= {CYCLE_CAP}
"""

_DOC_SHINGLES_SQL = """
    SELECT doc_id,
           list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          FOR i IN range(1, len(t) - 1)]) AS sh,
           t
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> len(x) > 0) AS t
        FROM documents
    )
"""


# ------------------------------------------------------- round-1 queries


def q_out_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    return g.outDegrees.select(F.col("id"), F.col("outDegree").alias("out_degree"))


def q_in_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    return g.inDegrees.select(F.col("id"), F.col("inDegree").alias("in_degree"))


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    return g.degrees.select(F.col("id"), F.col("degree"))


def q_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    t = g.triplets
    return t.select(
        t["src"]["id"].alias("src_id"),
        t["dst"]["id"].alias("dst_id"),
    )


def q_motif_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    m = g.find("(a)-[]->(b); (b)-[]->(c)")
    return m.select(
        F.col("a")["id"].alias("a_id"),
        F.col("b")["id"].alias("b_id"),
        F.col("c")["id"].alias("c_id"),
    )


def q_motif_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    m = g.find("(a)-[e]->(b); (b)-[e2]->(a)").filter("a.id < b.id")
    return m.select(
        F.col("a")["id"].alias("a_id"), F.col("b")["id"].alias("b_id")
    )


def q_motif_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    m = g.find("(a)-[]->(b); !(b)-[]->(a)")
    return m.select(
        F.col("a")["id"].alias("a_id"), F.col("b")["id"].alias("b_id")
    )


def q_motif_var_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    m = g.find("(a)-[e*1..2]->(b)")
    return m.select(
        F.col("a")["id"].alias("a_id"),
        F.col("b")["id"].alias("b_id"),
        F.col("_hop").alias("hop"),
    )


def q_filter_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    sub = g.filterVertices("id % 2 = 0")
    return sub.edges.select("src", "dst")


def q_type_out_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = customer.select(F.col("c_custkey").alias("id"))
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        F.col("o_orderstatus"),
    )
    g = GraphFrame(v.unionByName(e.select(F.col("dst").alias("id"))), e)
    td = g.typeOutDegree("o_orderstatus", ["F", "O", "P"])
    return td.select(
        F.col("id"),
        F.col("outDegrees")["F"].alias("deg_f"),
        F.col("outDegrees")["O"].alias("deg_o"),
        F.col("outDegrees")["P"].alias("deg_p"),
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    return g.triangleCount().select(F.col("id"), F.col("count").alias("n_triangles"))


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    return g.connectedComponents().select("id", "component")


def _chain_landmark(spark: SparkSession, sf_dir: str) -> int:
    """Event id 21 hops into the min-user chain (bounds supersteps at any
    SF). One bounded agg + one single-user window — the per-user rank is
    computed AFTER the user filter so no full-table window runs."""
    events = _read_events(spark, sf_dir)
    min_user = events.agg(F.min("user_id")).collect()[0][0]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    user_seq = (
        events.filter(F.col("user_id") == min_user)
        .select("event_id", F.row_number().over(w).alias("rn"))
    )
    row = (
        user_seq.withColumn("m", F.max("rn").over(Window.partitionBy()))
        .filter(F.col("rn") == F.least(F.col("m"), F.lit(21)))
        .select("event_id")
        .collect()[0]
    )
    return row["event_id"]


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    landmark = _chain_landmark(spark, sf_dir)
    sp = g.shortestPaths(landmarks=[landmark])
    return sp.select(
        F.col("id"), F.explode(F.col("distances")).alias("landmark", "distance")
    )


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-sampled harmonic/closeness centrality on the event chain
    (lib/centrality.py): one BFS to the chain landmark, then per-row
    higher-order aggregates over the bounded distances map — zero
    incremental shuffle over shortestPaths itself."""
    g = _events_chain_graph(spark, sf_dir)
    landmark = _chain_landmark(spark, sf_dir)
    hc = g.harmonicCentrality(landmarks=[landmark])
    return hc.select(
        F.col("id"),
        F.col("n_reached"),
        F.col("dist_sum"),
        F.round("harmonic", 9).alias("harmonic"),
        F.round("closeness", 9).alias("closeness"),
    )


def q_node2vec_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec walks on the event chain (graphframes_spark/node2vec.py):
    every vertex has exactly one out-neighbor, so the biased sampler is
    forced and walks are exact chain prefixes — a full-hash oracle for
    the second-order walk machinery (p/q/Gumbel-max paths all execute)."""
    g = _events_chain_graph(spark, sf_dir)
    walks = g.node2vecWalks(walkLength=5, p=2.0, q=0.5, seed=11)
    return walks.select(
        F.col("start"),
        F.col("walk_idx"),
        F.concat_ws(" ", F.col("random_walk").cast("array<string>")).alias("walk"),
        F.size("random_walk").alias("walk_len"),
    )


def q_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound eccentricity of the chain landmark (lib/centrality.py):
    on a chain the farthest vertex reaching the landmark is the chain
    head, so eccentricity == the landmark's 0-based chain position and
    n_reached == position + 1 — closed-form in SQL."""
    g = _events_chain_graph(spark, sf_dir)
    landmark = _chain_landmark(spark, sf_dir)
    return g.eccentricity(landmarks=[landmark])


def q_dp_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (datapipe/similarity.py):
    per-vector absmax scaling replayed element-for-element by DuckDB
    list_transform."""
    from graphframes_spark.datapipe import quantize_embeddings

    q = quantize_embeddings(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.concat_ws(" ", F.col("qvec").cast("array<string>")).alias("qvec_str"),
        F.round("scale", 9).alias("scale"),
    )


def q_shortest_paths_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isDirected=False path: the canonically-oriented clique graph (each
    edge stored once, src < dst) still yields distance 1 to every
    same-region vertex because the undirected expansion symmetrizes."""
    g = _nation_canon_graph(spark, sf_dir)
    sp = g.shortestPaths(landmarks=[0], isDirected=False)
    return sp.select(
        F.col("id"), F.explode(F.col("distances")).alias("landmark", "distance")
    )


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP (lib/sssp.py) on the per-user event chains with the
    source event's value as the edge weight; chains have a unique path
    per pair, so the DuckDB oracle is an exact prefix-sum difference."""
    events = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = events.select(
        F.col("event_id").alias("src"),
        F.lead("event_id").over(w).alias("dst"),
        F.col("value").alias("weight"),
    ).filter(F.col("dst").isNotNull())
    g = GraphFrame(events.select(F.col("event_id").alias("id")), edges)
    landmark = _chain_landmark(spark, sf_dir)
    sp = g.shortestPathsWeighted([landmark], weightCol="weight")
    return sp.select(
        F.col("id"), F.explode(F.col("distances")).alias("landmark", "distance")
    ).select(
        "id", "landmark", F.round("distance", 6).alias("distance")
    )


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the customer-order graph: the one-line graph
    summary every sizing decision starts from (two partial-aggregatable
    shuffles, no joins)."""
    g = _customer_order_graph(spark, sf_dir)
    return (
        g.degrees.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the customer-order bipartite graph
    (strongly negative: hubs connect to degree-1 orders). One row; the
    Pearson moments are replayed with DuckDB's corr()."""
    g = _customer_order_graph(spark, sf_dir)
    return g.degreeAssortativity().select(
        F.round(F.col("assortativity"), 6).alias("assortativity")
    )


def q_modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity of the nation graph under an id%3
    partition that deliberately crosses region-clique boundaries, so
    both the intra-edge and degree-mass terms are exercised."""
    g = _nation_graph(spark, sf_dir)
    asg = g.vertices.select(
        F.col("id"), (F.col("id") % 3).alias("community")
    )
    return g.modularity(asg).select(
        F.round(F.col("modularity"), 6).alias("modularity")
    )


#: vertex-id offsets for the region->nation->customer tree (customer
#: keys stay raw; both offsets clear any realistic custkey range)
NAT_OFF = 50_000_000
REG_OFF = 60_000_000


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes betweenness from all region roots over the directed
    region->nation->customer tree. On an out-tree sigma == 1 everywhere
    and delta(v) = #descendants, so each nation's betweenness is exactly
    its customer count — closed-form in SQL."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    v = (
        region.select((F.col("r_regionkey") + REG_OFF).alias("id"))
        .unionByName(nation.select((F.col("n_nationkey") + NAT_OFF).alias("id")))
        .unionByName(customer.select(F.col("c_custkey").alias("id")))
    )
    e = nation.select(
        (F.col("n_regionkey") + REG_OFF).alias("src"),
        (F.col("n_nationkey") + NAT_OFF).alias("dst"),
    ).unionByName(
        customer.select(
            (F.col("c_nationkey") + NAT_OFF).alias("src"),
            F.col("c_custkey").alias("dst"),
        )
    )
    g = GraphFrame(v, e)
    sources = [r[0] + REG_OFF for r in region.select("r_regionkey").collect()]
    return g.betweennessCentrality(sources, maxDepth=4).select(
        "id", F.round("betweenness", 6).alias("betweenness")
    )


def q_coloring_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones-Plassmann coloring (lib/coloring.py) on the region cliques:
    with deterministic md5 priorities a clique colors strictly in
    priority order, so color == md5-rank-within-region − 1 — the full
    iterative machinery (local-maxima rounds, mex over neighbor colors)
    replayed by one SQL window."""
    g = _nation_graph(spark, sf_dir)
    return g.greedyColoring(seed="r4").select("id", "color")


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit triangle enumeration (compact-forward) over the region
    cliques — every within-region nation triple exactly once."""
    g = _nation_graph(spark, sf_dir)
    return g.enumerateTriangles()


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the nation within-region cliques: every edge of a
    5-clique sits in 3 triangles, so the peeling fixpoint is the full
    canonical edge set with support 3 — exactly expressible in SQL."""
    g = _nation_graph(spark, sf_dir)
    return g.kTruss(4).select("src", "dst", "support")


def _nation_customer_graph(spark: SparkSession, sf_dir: str) -> GraphFrame:
    """Nation cliques (offset by NAT_OFF) + nation->customer spokes:
    clique wedges are closed (triangles), spoke wedges are open — so
    global transitivity is strictly between 0 and 1."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = nation.select((F.col("n_nationkey") + NAT_OFF).alias("id")).unionByName(
        customer.select(F.col("c_custkey").alias("id"))
    )
    n1 = nation.select(
        (F.col("n_nationkey") + NAT_OFF).alias("src"),
        F.col("n_regionkey").alias("r1"),
    )
    n2 = nation.select(
        (F.col("n_nationkey") + NAT_OFF).alias("dst"),
        F.col("n_regionkey").alias("r2"),
    )
    cliques = (
        n1.join(n2, F.col("r1") == F.col("r2"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    spokes = customer.select(
        (F.col("c_nationkey") + NAT_OFF).alias("src"),
        F.col("c_custkey").alias("dst"),
    )
    return GraphFrame(v, cliques.unionByName(spokes))


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient 3*triangles/wedges of the
    nation-clique + customer-spoke graph; the oracle recounts triangles
    with a three-way canonical-edge join and wedges from degrees."""
    g = _nation_customer_graph(spark, sf_dir)
    return g.transitivity().select(
        F.round(F.col("transitivity"), 6).alias("transitivity")
    )


def q_split_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test edge split of the customer-order
    graph keyed on the (src, dst) pair (GraphFrame.splitEdges); the md5
    threshold chain replays verbatim."""
    g = _customer_order_graph(spark, sf_dir)
    out = g.splitEdges(weights={"train": 0.8, "test": 0.2}, seed="r4")
    return out.select("src", "dst", "split")


def q_negative_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling on the nation graph (3 proposals
    per vertex, 4 hash buckets): the bucketed md5 tournament and the
    existing-edge anti-join replay row-for-row in SQL."""
    g = _nation_graph(spark, sf_dir)
    return g.sampleNegativeEdges(numPerVertex=3, seed="neg", numBuckets=4).select(
        "src", "dst"
    )


def q_louvain_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain communities of the nation graph (5 disjoint 5-cliques):
    phase-1 merges each clique, contraction leaves 5 isolated
    supervertices, and the stable min-member relabel makes the result
    exactly min(n_nationkey) per region — closed-form in SQL."""
    g = _nation_graph(spark, sf_dir)
    return g.louvain().select("id", "community")


def q_louvain_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain at data scale — no SQL oracle (the contraction hierarchy
    is not SQL-expressible; driver records a rows-only check, and
    louvain_regions carries the exact-oracle evidence). Weighted
    co-purchase graph: parts linked by #distinct co-ordering orders
    (>= 2), communities from 2 passes; returns per-community sizes."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_orderkey")
        .distinct()
    )
    a = li.select(F.col("l_partkey").alias("src"), F.col("l_orderkey").alias("o"))
    b = li.select(F.col("l_partkey").alias("dst"), F.col("l_orderkey").alias("o"))
    pairs = (
        a.join(b, on="o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= 2)
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    v = part.select(F.col("p_partkey").alias("id"))
    g = GraphFrame(v, pairs)
    asg = g.louvain(maxPasses=2, maxRoundsPerPass=6, weightCol="weight")
    return (
        asg.groupBy("community")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), "community")
    )


#: offset clears any event_id range so user and event vertices never collide
USER_OFF = 90_000_000


def q_dp_stream_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed vertex degrees of the user->event edge stream — the
    batch twin of datapipe/streaming.py stream_edge_degrees (identical
    plan minus the state store); hourly buckets replayed with DuckDB
    time_bucket."""
    from graphframes_spark.datapipe import stream_edge_degrees

    edges = _read_events(spark, sf_dir).select(
        (F.col("user_id") + USER_OFF).alias("src"),
        F.col("event_id").alias("dst"),
        F.col("ts"),
    )
    out = stream_edge_degrees(edges, window_duration="1 hour")
    # string-canonicalized window bound: identical text from Spark's
    # date_format and DuckDB's strftime, immune to timestamp dtype
    # differences in the driver's value hash
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "w_start"
        ),
        "id",
        F.col("outDegree").cast("long").alias("out_degree"),
        F.col("inDegree").cast("long").alias("in_degree"),
        F.col("degree").cast("long").alias("degree"),
    )


def q_describe_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph summary (GraphFrame.describe) of the customer-order
    bipartite graph — counts, density, degree extremes; every statistic
    restated as plain SQL aggregates."""
    g = _customer_order_graph(spark, sf_dir)
    d = g.describe()
    return d.select(
        "n_vertices",
        "n_edges",
        "n_distinct_edges",
        "n_self_loops",
        "n_isolated",
        F.round(F.col("density"), 9).alias("density"),
        F.round(F.col("avg_out_degree"), 6).alias("avg_out_degree"),
        "max_out_degree",
        "max_in_degree",
    )


def q_attr_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nominal assortativity by vertex type on the nation-clique +
    customer-spoke graph: clique ends are (n,n) but every spoke is
    (n,c)/(c,n), so type mixing is strongly disassortative (~-0.94).
    The mixing-matrix trace and marginal squares replay in SQL."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    g0 = _nation_customer_graph(spark, sf_dir)
    v = nation.select(
        (F.col("n_nationkey") + NAT_OFF).alias("id"), F.lit("n").alias("vtype")
    ).unionByName(
        customer.select(F.col("c_custkey").alias("id"), F.lit("c").alias("vtype"))
    )
    g = GraphFrame(v, g0.edges)
    return g.attributeAssortativity("vtype").select(
        F.round(F.col("assortativity"), 6).alias("assortativity")
    )


def q_wl_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Weisfeiler-Leman refinement round on the nation-clique +
    customer-spoke graph (lib/wl.py): md5 degree-pair colors refined by
    (hash-sum, count) per direction — replayed verbatim in SQL via
    DuckDB's 0x-hex cast."""
    g = _nation_customer_graph(spark, sf_dir)
    return g.wlLabels(iterations=1)


def q_seeded_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spreading down the region->nation->customer
    out-tree from region seeds (directed, 3 supersteps): every vertex
    ends with its ancestor region's key — closed-form in SQL."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    v = (
        region.select((F.col("r_regionkey") + REG_OFF).alias("id"))
        .unionByName(nation.select((F.col("n_nationkey") + NAT_OFF).alias("id")))
        .unionByName(customer.select(F.col("c_custkey").alias("id")))
    )
    e = nation.select(
        (F.col("n_regionkey") + REG_OFF).alias("src"),
        (F.col("n_nationkey") + NAT_OFF).alias("dst"),
    ).unionByName(
        customer.select(
            (F.col("c_nationkey") + NAT_OFF).alias("src"),
            F.col("c_custkey").alias("dst"),
        )
    )
    seeds = region.select(
        (F.col("r_regionkey") + REG_OFF).alias("id"),
        F.col("r_regionkey").alias("label"),
    )
    g = GraphFrame(v, e)
    return g.seededLabelPropagation(seeds, maxIter=3, isDirected=True).select(
        "id", "label"
    )


def q_contract_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient graph of the nation cliques under the region partition
    (GraphFrame.contractBy): 5 supervertices, each with a self-loop
    aggregating its clique's undirected weight — replayed in SQL with
    the same canonicalize + 2-join + aggregate shape."""
    g = _nation_graph(spark, sf_dir)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    asg = nation.select(
        F.col("n_nationkey").alias("id"), F.col("n_regionkey").alias("community")
    )
    q = g.contractBy(asg)
    return q.edges.select("src", "dst", F.round(F.col("weight"), 6).alias("weight"))


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (alpha=0.1, 3 supersteps) on the
    per-user event chains; the oracle recomputes walk counts of length
    1..3 with three cascaded joins and folds the alpha powers."""
    g = _events_chain_graph(spark, sf_dir)
    return g.katzCentrality(alpha=0.1, maxIter=3).select(
        "id", F.round(F.col("katz"), 6).alias("katz")
    )


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the customer->order graph with the reverse
    edge added only for orderkey % 3 == 0 — a deterministic mixed
    directed graph (reciprocity strictly between 0 and 1)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        orders.select((F.col("o_orderkey") + ORDER_OFFSET).alias("id"))
    )
    fwd = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
    )
    back = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + ORDER_OFFSET).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    g = GraphFrame(v, fwd.unionByName(back))
    return g.reciprocity().select(
        F.round(F.col("reciprocity"), 6).alias("reciprocity")
    )


def q_sample_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vertex-induced subgraph sample (GraphFrame
    .sampleVertices) of the customer-order graph at fraction 0.5; the
    md5-threshold selection replays bit-identically in the oracle."""
    g = _customer_order_graph(spark, sf_dir).sampleVertices(0.5, seed="r4")
    return g.outDegrees.select("id", F.col("outDegree").alias("out_degree"))


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (lib/triangle_count.py) over the
    triangle-rich part co-purchase projection (pairs co-ordered in >= 2
    distinct orders)."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_orderkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, on="_o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id")
    )
    g = GraphFrame(parts, pairs)
    return g.clusteringCoefficient().select(
        "id",
        F.col("count").alias("n_triangles"),
        F.round("coefficient", 6).alias("coefficient"),
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors + Adamic-Adar (lib/linkpred.py) on the
    customer-order bipartite: order pairs share exactly their customer,
    so adamic_adar = 1/ln(customer degree) — varied, exactly checkable."""
    g = _customer_order_graph(spark, sf_dir)
    s = g.commonNeighborScores(includeJaccard=True)
    return s.select(
        "id_a",
        "id_b",
        "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (lib/hits.py) on the supplier→part bipartite from lineitem;
    2 iterations, matched by a fully-unrolled DuckDB oracle. Parts get
    offset long ids (same trick as pg_copurchase) — 8-byte join keys
    beat prefixed strings on every shuffle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + F.lit(ORDER_OFFSET)).alias("dst"),
    ).distinct()
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        (F.col("p_partkey").cast("long") + F.lit(ORDER_OFFSET)).alias("id")
    )
    g = GraphFrame(supp.unionByName(part), e)
    res = g.hits(maxIter=2)
    return res.select(
        "id",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    return g.labelPropagation(maxIter=3).select("id", "label")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    pr = g.pageRank(resetProbability=0.15, maxIter=10)
    return pr.vertices.select(
        F.col("id"), F.round(F.col("pagerank"), 10).alias("pagerank")
    )


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    src = customer.agg(F.min("c_custkey")).collect()[0][0]
    g = _customer_order_graph(spark, sf_dir)
    pr = g.pageRank(resetProbability=0.15, sourceId=int(src), maxIter=3)
    return pr.vertices.select(
        F.col("id"), F.round(F.col("pagerank"), 10).alias("pagerank")
    )


def q_pagerank_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-mode PageRank on the regular nation cliques: the uniform
    1/N vector is the fixed point, so convergence is immediate and the
    closed-form oracle applies."""
    g = _nation_graph(spark, sf_dir)
    pr = g.pageRank(resetProbability=0.15, tol=1e-6)
    return pr.vertices.select(
        F.col("id"), F.round(F.col("pagerank"), 10).alias("pagerank")
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (weightCol=o_totalprice) on the customer-order
    bipartite graph, maxIter=2: customers have no in-edges so their rank
    settles at alpha/n after one superstep and the order ranks after two
    are a closed form over the per-customer price shares."""
    g = _customer_order_graph(spark, sf_dir)
    pr = g.pageRank(maxIter=2, weightCol="o_totalprice")
    return pr.vertices.select("id", F.round("pagerank", 10).alias("pagerank"))


def q_aggregate_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.lib.aggregate_messages import AggregateMessages as AM

    g = _customer_order_graph(spark, sf_dir)
    agg = g.aggregateMessages(
        F.sum(AM.msg).alias("total_spent"),
        sendToSrc=AM.edge["o_totalprice"].cast("decimal(18,2)"),
    )
    return agg.select("id", F.col("total_spent").cast("double").alias("total_spent"))


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select("event_id", "user_id", F.row_number().over(w).alias("rn"))
    min_user = events.agg(F.min("user_id")).collect()[0][0]
    user_seq = seq.filter(F.col("user_id") == min_user)
    start = user_seq.filter(F.col("rn") == 1).collect()[0]["event_id"]
    target = user_seq.filter(F.col("rn") == 4).collect()[0]["event_id"]
    g = _events_chain_graph(spark, sf_dir)
    paths = g.bfs(f"id = {start}", f"id = {target}", maxPathLength=5)
    return paths.select(
        F.col("from")["id"].alias("from_id"),
        F.col("v1")["id"].alias("v1_id"),
        F.col("v2")["id"].alias("v2_id"),
        F.col("to")["id"].alias("to_id"),
    )


# ------------------------------------------------- round-2 graph queries


def q_filter_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    return g.filterEdges("src < dst").edges.select("src", "dst")


def q_drop_isolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    sub = g.filterEdges("o_totalprice > 200000").dropIsolatedVertices()
    return sub.vertices.select("id")


def q_as_undirected_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    und = g.asUndirected()
    return und.outDegrees.select(
        F.col("id"), F.col("outDegree").alias("degree")
    )


def q_as_reversed(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _customer_order_graph(spark, sf_dir)
    rev = g.asReversed()
    return rev.outDegrees.select(F.col("id"), F.col("outDegree").alias("n"))


def q_type_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # order -> customer edges typed by status
    e = orders.select(
        (F.col("o_orderkey") + ORDER_OFFSET).alias("src"),
        F.col("o_custkey").alias("dst"),
        F.col("o_orderstatus"),
    )
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        e.select(F.col("src").alias("id"))
    )
    g = GraphFrame(v, e)
    td = g.typeInDegree("o_orderstatus", ["F", "O", "P"])
    return td.select(
        F.col("id"),
        F.col("inDegrees")["F"].alias("deg_f"),
        F.col("inDegrees")["O"].alias("deg_o"),
        F.col("inDegrees")["P"].alias("deg_p"),
    )


def q_type_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        F.col("o_orderstatus"),
    )
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    g = GraphFrame(v, e)
    td = g.typeDegree("o_orderstatus", ["F", "O", "P"])
    return td.select(
        F.col("id"),
        F.col("degrees")["F"].alias("deg_f"),
        F.col("degrees")["O"].alias("deg_o"),
        F.col("degrees")["P"].alias("deg_p"),
    )


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    srcs = [r[0] for r in customer.select("c_custkey").orderBy("c_custkey").limit(2).collect()]
    g = _customer_order_graph(spark, sf_dir)
    res = g.parallelPersonalizedPageRank(
        resetProbability=0.15, sourceIds=srcs, maxIter=3
    )
    return res.vertices.select(
        F.col("id"),
        F.round(F.element_at("pageranks", 1), 10).alias("ppr1"),
        F.round(F.element_at("pageranks", 2), 10).alias("ppr2"),
    )


def q_pregel_indegree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.pregel import Pregel

    g = _nation_graph(spark, sf_dir)
    res = (
        g.pregel.setMaxIter(1)
        .withVertexColumn(
            "cnt",
            F.lit(0).cast("long"),
            F.coalesce(Pregel.msg(), F.lit(0).cast("long")),
        )
        .sendMsgToDst(F.lit(1).cast("long"))
        .aggMsgs(F.sum(Pregel.msg()))
        .run()
    )
    return res.select("id", "cnt")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_canon_graph(spark, sf_dir)
    return g.kCore().select("id", "kcore")


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _user_cycles_graph(spark, sf_dir)
    return g.stronglyConnectedComponents(maxIter=10).select("id", "component")


def q_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _user_cycles_graph(spark, sf_dir)
    cycles = g.detectingCycles()
    return cycles.select(
        F.element_at("found_cycles", 1).alias("cycle_id"),
        F.posexplode("found_cycles").alias("pos", "event_id"),
    )


def q_lpa_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    return g.labelPropagation(maxIter=3).select("id", "label")


def q_cc_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    return g.connectedComponents().select("id", "component")


def q_cc_string_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = customer.select(F.concat(F.lit("c"), F.col("c_custkey")).alias("id")).unionByName(
        orders.select(F.concat(F.lit("o"), F.col("o_orderkey")).alias("id"))
    )
    e = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("o"), F.col("o_orderkey")).alias("dst"),
    )
    g = GraphFrame(v, e)
    return g.connectedComponents(useLabelsAsComponents=True).select("id", "component")


def q_pagerank_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    pr = g.pageRank(resetProbability=0.15, maxIter=5)
    return pr.vertices.select(
        F.col("id"), F.round(F.col("pagerank"), 10).alias("pagerank")
    )


# ---------------------------------------------------- datapipe queries


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dp_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), ["lang", "n_chars"], "doc_id").select(
        F.col("doc_id"), F.col("canonical_id"), F.col("group_size")
    )


def q_dp_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import token_count, token_count_bpe

    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id"),
        token_count(F.col("text")).alias("n_ws_tokens"),
        token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


def q_dp_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import with_quality_scores

    d = with_quality_scores(_docs(spark, sf_dir))
    return d.select(
        F.col("doc_id"),
        F.col("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.col("keep"),
    )


def q_dp_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import language_id

    return _docs(spark, sf_dir).select(
        F.col("doc_id"), language_id(F.col("text")).alias("lang_pred")
    )


def q_dp_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import fingerprint, minhash_fingerprint

    return _docs(spark, sf_dir).select(
        F.col("doc_id"),
        fingerprint(F.col("text")).alias("fp"),
        minhash_fingerprint(F.col("text")).alias("minfp"),
    )


def q_dp_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import minhash_lsh_dedup

    return minhash_lsh_dedup(
        _docs(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        shingle_len=3,
        num_perm=NUM_PERM,
        num_bands=NUM_BANDS,
        threshold=JACCARD_T,
    ).select(F.col("id").alias("doc_id"), F.col("component"))


def q_dp_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=JACCARD_T
    ).select("id_a", "id_b")


def q_dp_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import simhash_pairs

    return simhash_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", max_hamming=HAMMING_T
    ).select("id_a", "id_b")


def q_dp_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import embedding_cosine_pairs

    return embedding_cosine_pairs(
        _emb(spark, sf_dir), id_col="vec_id", vec_col="embedding", threshold=COSINE_T
    ).select("id_a", "id_b")


def q_dp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import brute_force_topk

    emb = _emb(spark, sf_dir)
    return brute_force_topk(
        emb, emb.filter("vec_id < 10"), k=5, id_col="vec_id", vec_col="embedding"
    ).select("query_id", "neighbor_id", "rank")


def q_dp_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphframes_spark.datapipe import with_binary

    d = with_binary(_docs(spark, sf_dir), "text")
    return d.select(
        F.col("doc_id"),
        F.col("meta")["byte_len"].alias("byte_len"),
        F.col("meta")["sha256"].alias("sha256"),
    )


def q_dp_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-2-gram fraction (Gopher-style repetition
    filter signal); pure per-row column algebra, zero shuffles."""
    from graphframes_spark.datapipe import repetition_stats

    out = repetition_stats(_docs(spark, sf_dir), id_col="doc_id", n=2)
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_distinct_ngrams",
        F.round(F.col("dup_ngram_frac"), 6).alias("dup_frac"),
    )


def q_dp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-normalization pre-pass (lower / collapse non-alnum / trim)
    plus its md5 — a codegen-resident narrow transform whose oracle is
    the same regex replayed by DuckDB's RE2."""
    from graphframes_spark.datapipe import normalize_text

    d = _docs(spark, sf_dir)
    norm = normalize_text(F.col("text"))
    return d.select("doc_id", norm.alias("normalized"), F.md5(norm).alias("norm_md5"))


def q_dp_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: redacted text + per-document email/IP/phone
    match counts (zero on this synthetic corpus — the oracle verifies
    the full regex pipeline end-to-end; crafted-PII behavior is covered
    in tests/test_datapipe.py)."""
    from graphframes_spark.datapipe import redact_pii

    return redact_pii(_docs(spark, sf_dir))


def q_dp_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document: explode + two hash aggs + a
    vocabulary join + per-doc top-k window; scores rounded before
    ranking so the (score DESC, term ASC) order is engine-stable."""
    from graphframes_spark.datapipe import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=5)


def q_dp_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment keyed on doc_id
    (datapipe/sampling.py split_corpus): the seeded-md5 threshold chain
    is replayed verbatim by the oracle, so membership is bit-stable
    across engines and reruns."""
    from graphframes_spark.datapipe import split_corpus

    return split_corpus(_docs(spark, sf_dir), "doc_id", seed="r4").select(
        "doc_id", "split"
    )


def q_dp_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best duplicate resolution over exact-content groups: one row
    per md5 fingerprint survives (longest text, ties to smallest id)."""
    from graphframes_spark.datapipe import dedup_keep_best, fingerprint

    d = _docs(spark, sf_dir).withColumn("fp", fingerprint(F.col("text")))
    return dedup_keep_best(d, "fp", "n_chars", "doc_id").select(
        "doc_id", "fp", "keep"
    )


def q_dp_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark n-gram decontamination: documents sharing >= 2
    distinct 3-grams with the doc_id % 10 == 0 slice (the stand-in
    benchmark set); inverted-index join, never all-pairs."""
    from graphframes_spark.datapipe import ngram_overlap

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    return ngram_overlap(
        docs, bench, n=3, min_shared=2
    ).select(F.col("doc_id"), F.col("ref_doc_id"), F.col("n_shared"))


def q_dp_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (64-token windows, 16-token overlap)
    over the document corpus — the context-window prep step of an LLM
    training pipeline (datapipe/text.py chunk_documents). Pure narrow
    posexplode+slice transform, no shuffle."""
    from graphframes_spark.datapipe import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), size=64, overlap=16)


def q_dp_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization of the events stream (1-hour activity gap) —
    the deterministic twin of the applyInPandasWithState streaming
    operator (datapipe/streaming.py stream_sessionize)."""
    from graphframes_spark.datapipe import sessionize_batch

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_batch(events, gap_seconds=3600).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
    )


def q_dp_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic language-balanced sample: 20 docs per lang via the
    two-level md5-rank tournament (datapipe/sampling.py balanced_sample);
    the salt changes the plan, never the rows, so the salted Spark run
    must hash-match the single-window DuckDB oracle."""
    from graphframes_spark.datapipe import balanced_sample

    return balanced_sample(
        _docs(spark, sf_dir), "lang", 20, "doc_id", seed="r4", salt=8
    ).select("doc_id", "lang", "source")


def q_dp_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus health rollup: volume, mean token count,
    quality keep-rate, exact-duplicate rate (datapipe/sampling.py
    source_rollup)."""
    from graphframes_spark.datapipe import source_rollup

    r = source_rollup(_docs(spark, sf_dir))
    return r.select(
        "source",
        "lang",
        "n_docs",
        F.round("avg_tokens", 6).alias("avg_tokens"),
        F.round("keep_rate", 6).alias("keep_rate"),
        "n_unique",
        F.round("dup_rate", 6).alias("dup_rate"),
    )


def q_dp_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source size-distribution profile: exact interpolated
    percentiles of token count and char length (datapipe/sampling.py
    corpus_profile); DuckDB replays them with quantile_cont."""
    from graphframes_spark.datapipe import corpus_profile

    prof = corpus_profile(_docs(spark, sf_dir))
    keep = [c for c in prof.columns if c not in ("source", "n_docs")]
    return prof.select(
        "source", "n_docs", *[F.round(F.col(c), 6).alias(c) for c in keep]
    )


def q_dp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (datapipe/text.py pack_documents): 4 sharded
    token streams chopped every 256 tokens; the md5 order, shard hash,
    and cumulative-sum window replay verbatim."""
    from graphframes_spark.datapipe import pack_documents

    out = pack_documents(
        _docs(spark, sf_dir), max_tokens=256, num_shards=4, seed="pack"
    )
    return out.select(
        "doc_id", "shard", "bin", "bin_pos", "n_tokens", "straddles"
    )


def q_dp_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call dedup capstone in exact mode: normalized-content
    fingerprint groups + keep-the-longest resolution (datapipe/dedup.py
    dedup_corpus); fingerprint, token quality, and the keep window all
    replay in SQL."""
    from graphframes_spark.datapipe import dedup_corpus

    out = dedup_corpus(_docs(spark, sf_dir), method="exact")
    return out.select("doc_id", "dedup_group", "keep")


def q_dp_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent segment removal (datapipe/text.py
    remove_boilerplate) in token mode (delimiter=' '): tokens present in
    >= 50% of documents are stripped — corpus-adaptive stopword removal.
    The oracle replays split/threshold/rebuild with string_agg."""
    from graphframes_spark.datapipe import remove_boilerplate

    out = remove_boilerplate(
        _docs(spark, sf_dir), delimiter=" ", min_doc_frac=0.5, min_doc_count=2
    )
    return out.select("doc_id", "text", "n_segments", "n_removed")


def q_dp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN — no SQL oracle (bucket recall is by design < 1);
    driver records a rows-only check."""
    from graphframes_spark.datapipe import lsh_topk

    emb = _emb(spark, sf_dir)
    return lsh_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_planes=4,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id", "rank")


def q_dp_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — KMeans cells are seed-stable but not SQL-expressible;
    rows-only check."""
    from graphframes_spark.datapipe import ivf_topk

    emb = _emb(spark, sf_dir)
    return ivf_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_cells=8, nprobe=3,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id", "rank")


def q_dp_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """num_planes=0 puts the whole corpus in one bucket, degenerating LSH
    to exact top-k — hash-verifies the sketch/bucket-join/rerank machinery
    against the brute-force oracle."""
    from graphframes_spark.datapipe import lsh_topk

    emb = _emb(spark, sf_dir)
    return lsh_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_planes=0,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id", "rank")


def q_dp_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nprobe == num_cells probes every cell, degenerating IVF to exact
    top-k — hash-verifies the quantize/probe/rerank machinery."""
    from graphframes_spark.datapipe import ivf_topk

    emb = _emb(spark, sf_dir)
    return ivf_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_cells=4, nprobe=4,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id", "rank")


def q_dp_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing. The deterministic fake decoder is a
    16-bin byte histogram and the documents are pure ASCII, so the whole
    path — encode, Arrow batch transfer, Python decode, re-round — has an
    exact DuckDB oracle (char-code histogram)."""
    from graphframes_spark.datapipe import extract_features, with_binary

    d = with_binary(_docs(spark, sf_dir), "text")
    feats = extract_features(d, id_col="doc_id")
    return feats.select(
        F.col("doc_id"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    )


def q_triangle_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch triangle count; on K5 cliques (degree 4 << 2^12
    nominal entries) the sketches are exact, so the exact oracle applies."""
    g = _nation_graph(spark, sf_dir)
    return g.triangleCount(algorithm="approx").select(
        F.col("id"), F.col("count").alias("n_triangles")
    )


def q_aggregate_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_graph(spark, sf_dir)
    res = g.aggregate_neighbors(
        starting_vertices=F.col("id") == 0,
        max_hops=2,
        accumulator_names=["n_hops"],
        accumulator_inits=[F.lit(0)],
        accumulator_updates=[F.col("n_hops") + F.lit(1)],
        stopping_condition=F.col("n_hops") + F.lit(1) >= F.lit(2),
    )
    return res.select("id", "hop", "n_hops")


def q_svdpp_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SVD++ on the customer-order bipartite rating graph. Latent factors
    are hash-initialized (not SQL-replicable), but the implicit-feedback
    norm column4 = |N(v)|^-0.5 is deterministic — oracle checks it."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        orders.select((F.col("o_orderkey") + ORDER_OFFSET).alias("id"))
    )
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        (F.col("o_totalprice") / 100000.0).alias("weight"),
    )
    df, _loss = GraphFrame(v, e).svdPlusPlus(rank=4, maxIter=1)
    return df.select(F.col("id"), F.round("column4", 8).alias("norm"))


def q_pic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration clustering — ml-internal initialization is not
    SQL-replicable; rows-only check."""
    g = _nation_graph(spark, sf_dir)
    return g.powerIterationClustering(k=5, maxIter=20).select("id", "cluster")


def q_pic_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIC labels are init-dependent; normalizing each cluster to its min
    member id makes the output deterministic. On 5 disconnected nation
    cliques PIC recovers the regions for any init (verified across
    partitionings), so the normalized assignment has an exact oracle."""
    g = _nation_graph(spark, sf_dir)
    a = g.powerIterationClustering(k=5, maxIter=20)
    reps = a.groupBy("cluster").agg(F.min("id").alias("cluster_rep"))
    return a.join(F.broadcast(reps), "cluster").select("id", "cluster_rep")


def _supplier_nation_pg(spark: SparkSession, sf_dir: str):
    from graphframes_spark.propertygraph import (
        EdgePropertyGroup,
        PropertyGraphFrame,
        VertexPropertyGroup,
    )

    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    suppliers = VertexPropertyGroup("suppliers", supplier, "s_suppkey")
    nations = VertexPropertyGroup("nations", nation, "n_nationkey")
    in_nation = EdgePropertyGroup(
        "in_nation",
        supplier.select("s_suppkey", "s_nationkey").withColumn("w", F.lit(1.0)),
        suppliers,
        nations,
        True,
        "s_suppkey",
        "s_nationkey",
        "w",
    )
    return PropertyGraphFrame([suppliers, nations], [in_nation])


def q_pg_unify(spark: SparkSession, sf_dir: str) -> DataFrame:
    pg = _supplier_nation_pg(spark, sf_dir)
    g = pg.to_graph_frame(["suppliers", "nations"], ["in_nation"])
    return g.vertices.select("id", "property_group").unionByName(
        g.edges.select(
            F.col("src").alias("id"), F.lit("_edge_src").alias("property_group")
        )
    )


def q_pg_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    pg = _supplier_nation_pg(spark, sf_dir)
    projected = pg.projection_by("suppliers", "nations", "in_nation")
    eg = projected.edge_property_groups[-1]
    return eg.data.select(
        F.col("src").alias("s1"), F.col("dst").alias("s2"), F.col("weight")
    )


def q_pg_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket projection at data scale: the lineitem bipartite
    graph (the largest table) projected onto parts via projectionBy,
    keeping part pairs co-purchased in >= 2 distinct orders. Scale
    posture: the projection is a self-equi-join keyed on order id (AQE
    splits hot orders), the count is a partial-aggregatable groupBy."""
    from graphframes_spark.propertygraph import (
        EdgePropertyGroup,
        PropertyGraphFrame,
        VertexPropertyGroup,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_orderkey")
        .distinct()
        .withColumn("w", F.lit(1.0))
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    parts_g = VertexPropertyGroup("parts", part, "p_partkey")
    orders_g = VertexPropertyGroup("orders", orders, "o_orderkey")
    bought = EdgePropertyGroup(
        "bought", li, parts_g, orders_g, True, "l_partkey", "l_orderkey", "w"
    )
    pg = PropertyGraphFrame([parts_g, orders_g], [bought])
    projected = pg.projection_by("parts", "orders", "bought")
    eg = projected.edge_property_groups[-1]
    return (
        eg.data.groupBy(
            F.col("src").alias("part_a"), F.col("dst").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def q_pg_join_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joinVertices back-mapping: run degrees on the unified supplier-
    nation graph, then map masked internal ids back to per-group external
    keys (PropertyGraphFrame.scala:169-189). Degrees are deterministic,
    so the sha2-mask roundtrip has an exact SQL oracle."""
    pg = _supplier_nation_pg(spark, sf_dir)
    g = pg.to_graph_frame(["suppliers", "nations"], ["in_nation"])
    vdata = g.vertices.join(g.degrees, "id", "left")
    out = pg.join_vertices(vdata, ["suppliers", "nations"])
    return out.select(
        F.col("external_id").cast("long").alias("external_id"),
        "property_group",
        F.coalesce(F.col("degree"), F.lit(0)).cast("int").alias("degree"),
    )


def q_kmin_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-min neighbor sampling (rw.sampled_neighbors): the xxhash64
    ranking is engine-specific, but the sample *shape* is exact — every
    vertex draws min(k, degree) distinct, genuine out-neighbors. Those
    invariants are the oracle (mirrors the mis_regions pattern)."""
    from graphframes_spark.rw import NBRS_COL, sampled_neighbors

    g = _nation_graph(spark, sf_dir)
    s = sampled_neighbors(g.edges, max_nbrs=3, seed=7, use_edge_direction=True)
    ex = s.select(F.col("id"), F.explode(F.col(NBRS_COL)).alias("nbr"))
    true_e = (
        g.edges.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .distinct()
        .withColumn("_t", F.lit(1))
    )
    return (
        ex.join(true_e, ["id", "nbr"], "left")
        .groupBy(F.col("id").cast("long").alias("id"))
        .agg(
            F.count("*").alias("n_sampled"),
            F.count("_t").alias("n_valid"),
            F.countDistinct("nbr").alias("n_distinct"),
        )
    )


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized MIS — rand() is not oracle-replicable; rows-only check
    (pytest asserts the independence/maximality invariants)."""
    g = _nation_canon_graph(spark, sf_dir)
    return g.maximalIndependentSet(seed=42).select("id")


def q_mis_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact oracle for MIS despite the randomized algorithm: on the
    5-clique nation graph independence allows at most one member per
    clique and maximality forces at least one, so every region selects
    exactly one nation for any seed."""
    g = _nation_canon_graph(spark, sf_dir)
    mis = g.maximalIndependentSet(seed=42).select("id")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("id"), F.col("n_regionkey").alias("region")
    )
    return (
        mis.join(F.broadcast(nation), "id")
        .groupBy("region")
        .agg(F.count("*").alias("n_selected"))
    )


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-random walks — values are run-dependent (rand()/shuffle());
    rows-only check: 2 walks per nation, each of deterministic length 6."""
    import tempfile

    from graphframes_spark.rw import RandomWalkWithRestart

    g = _nation_graph(spark, sf_dir)
    rw = (
        RandomWalkWithRestart()
        .onGraph(g)
        .setNumWalksPerNode(2)
        .setBatchSize(3)
        .setNumBatches(2)
        .setGlobalSeed(42)
        .setTemporaryPrefix(tempfile.mkdtemp(prefix="gfs_rw_"))
    )
    walks = rw.run()
    return walks.select(
        F.col("random_walk_uuid").alias("walk_id"),
        F.size("random_walk").alias("walk_len"),
    )


def q_random_walk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk values are seeded-random, but walk *shape* is deterministic:
    every nation starts exactly 2 walks of length 6 (start + batch_size *
    num_batches - 1 hops), and a walk never leaves the start's
    region-clique (hops go to neighbors, restarts return to the start) —
    exact-oracle-able invariants even though visited ids are not."""
    import tempfile

    from graphframes_spark.rw import RandomWalkWithRestart

    g = _nation_graph(spark, sf_dir)
    rw = (
        RandomWalkWithRestart()
        .onGraph(g)
        .setNumWalksPerNode(2)
        .setBatchSize(3)
        .setNumBatches(2)
        .setGlobalSeed(42)
        .setTemporaryPrefix(tempfile.mkdtemp(prefix="gfs_rw_"))
    )
    walks = rw.run()
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = walks.select(
        F.element_at("random_walk", 1).alias("start_id"),
        F.size("random_walk").alias("walk_len"),
        F.col("random_walk"),
    )
    stats = w.groupBy("start_id").agg(
        F.count("*").alias("n_walks"),
        F.min("walk_len").alias("min_len"),
        F.max("walk_len").alias("max_len"),
    )
    start_r = nation.select(
        F.col("n_nationkey").alias("start_id"), F.col("n_regionkey").alias("_sr")
    )
    elem_r = nation.select(
        F.col("n_nationkey").alias("elem"), F.col("n_regionkey").alias("_er")
    )
    off = (
        w.select("start_id", F.explode("random_walk").alias("elem"))
        .join(F.broadcast(start_r), "start_id")
        .join(F.broadcast(elem_r), "elem")
        .filter(F.col("_sr") != F.col("_er"))
        .groupBy("start_id")
        .agg(F.count("*").alias("off_clique"))
    )
    return stats.join(off, "start_id", "left").select(
        "start_id",
        "n_walks",
        "min_len",
        "max_len",
        F.coalesce(F.col("off_clique"), F.lit(0).cast("long")).alias("off_clique"),
    )


def q_sampling_convolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-min sampling uses Spark-side xxhash64 — not oracle-replicable;
    rows-only check (pytest covers exact mean/concat semantics)."""
    from graphframes_spark.embeddings import sampling_convolution

    g = _nation_graph(spark, sf_dir)
    emb = g.vertices.select(
        F.col("id"),
        F.array(F.col("id").cast("double"), (F.col("id") * 2).cast("double")).alias(
            "vector"
        ),
    )
    out = sampling_convolution(g, emb, k=3, seed=7, concat_self=True)
    return out.select("id", F.size("vector").alias("dim"))


def q_sampling_convolution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-neighborhood convolution: k >= max degree makes the k-min
    sample deterministic (= all neighbors), so the mean-of-neighbors +
    concat-self output has an exact SQL oracle."""
    from graphframes_spark.embeddings import sampling_convolution

    g = _nation_graph(spark, sf_dir)
    emb = g.vertices.select(
        F.col("id"),
        F.array(F.col("id").cast("double"), (F.col("id") * 2).cast("double")).alias(
            "vector"
        ),
    )
    out = sampling_convolution(g, emb, k=16, seed=7, concat_self=True)
    return out.select(
        "id",
        F.round(F.element_at("vector", 3), 6).alias("nbr_mean0"),
        F.round(F.element_at("vector", 4), 6).alias("nbr_mean1"),
    )


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated eigenvector centrality (3 power-iteration supersteps,
    L2-normalized once at the end) on the functional graph c -> c % 97
    + 1 over customers — in-degrees vary with the residue distribution,
    so the walk counts are non-uniform; the oracle recomputes length-3
    walk counts with three cascaded joins and normalizes by the L2
    norm."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = customer.select(F.col("c_custkey").alias("id"))
    e = customer.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") % 97 + 1).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    g = GraphFrame(v, e)
    return g.eigenvectorCentrality(maxIter=3).select(
        "id", F.round(F.col("eigenvector"), 6).alias("eigenvector")
    )


def q_group_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupEdges on the supplier->part multigraph from lineitem (each
    (suppkey, partkey) pair recurs across lineitems): collapse parallel
    edges into count + quantity-sum attributes."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    v = (
        lineitem.select(F.col("l_suppkey").alias("id"))
        .unionByName(lineitem.select((F.col("l_partkey") + PART_OFFSET).alias("id")))
        .distinct()
    )
    e = lineitem.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + PART_OFFSET).alias("dst"),
        F.col("l_quantity"),
    )
    g = GraphFrame(v, e).groupEdges(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        dropSelfLoops=True,
    )
    return g.edges.select("src", "dst", "n_lineitems", "sum_qty")


def q_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyad/triad census on the partially-directed nation cliques: keep
    intra-region edge (a, b) when a < b or (a + b) % 3 == 0 — a
    deterministic mix of mutual and one-way dyads with both cyclic and
    transitive triangles."""
    g = _nation_graph(spark, sf_dir)
    g = g.filterEdges((F.col("src") < F.col("dst")) | ((F.col("src") + F.col("dst")) % 3 == 0))
    return g.triadCensus()


def q_dp_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 3-token spans over the documents corpus
    (substring-dedup signal, Lee et al. ACL 2022): grams in >= 2
    distinct documents with corpus-wide occurrence counts."""
    from graphframes_spark.datapipe import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), n=3, min_docs=2)


def q_dp_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary table with Zipf ranks (count >= 2) — the
    tokenizer-training / vocab-pruning input; the oracle replays the
    explode + aggregate + deterministic rank window in SQL."""
    from graphframes_spark.datapipe import word_frequencies

    wf = word_frequencies(_docs(spark, sf_dir), min_count=2)
    return wf.select(
        "token", "count", "rank", F.round("frequency", 9).alias("frequency")
    )


def q_dp_temp_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (tau = 0.5, target half the
    corpus): per-source keep rates realize the flattened w^tau mix,
    membership decided by seeded md5 over doc_id — the oracle replays
    rates and hash thresholds bit-for-bit."""
    from graphframes_spark.datapipe import temperature_sample

    kept = temperature_sample(
        _docs(spark, sf_dir),
        source_col="source",
        temperature=0.5,
        target_frac=0.5,
        key_col="doc_id",
        seed="mix",
    )
    return kept.select("doc_id", "source")


def q_dp_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-span coverage (3-grams shared with >= 1
    other document) — the doc-level dedup-filter signal; the oracle
    replays the gram table, the duplicated-gram HAVING filter, and the
    per-doc rollup."""
    from graphframes_spark.datapipe import dup_span_coverage

    cov = dup_span_coverage(_docs(spark, sf_dir), n=3, min_docs=2)
    return cov.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round("dup_coverage", 9).alias("dup_coverage"),
    )


def q_dp_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel view -> click -> purchase within 24h per step
    over the events stream (datapipe/funnel.py): per-step user counts;
    the greedy chain (earliest anchor, earliest qualifying successor)
    replays exactly in SQL."""
    from graphframes_spark.datapipe import funnel

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(events, ["view", "click", "purchase"], within_seconds=86400)


def q_dp_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram-LM quality scores (datapipe/text.py
    bigram_lm_scores, add-1 smoothing) — the CCNet-style perplexity
    filter signal; counts, marginals, V and the smoothed log-prob all
    replay in SQL."""
    from graphframes_spark.datapipe import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir)).select(
        "doc_id", "n_bigrams", "avg_logp"
    )


def q_belief_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colored-schedule BP (lib/belief_propagation.py, mirroring the
    reference's BeliefPropagation.scala example) on a deterministic 5x5
    Ising grid — potentials a=((5i+j)%7-3)/2, couplings
    b=0.1+0.02*((i_src+j_dst)%3) — run for 2 iterations (4 color
    steps); the oracle unrolls the same 4 steps as cascaded CTEs."""
    from graphframes_spark.graphframe import GraphFrame
    from graphframes_spark.lib.belief_propagation import belief_propagation

    n = 5
    cells = spark.range(n).select(F.col("id").alias("i")).crossJoin(
        spark.range(n).select(F.col("id").alias("j"))
    )
    v = cells.select(
        F.concat_ws(",", "i", "j").alias("id"),
        (((F.col("i") * n + F.col("j")) % 7 - 3) / 2.0).alias("a"),
        "i",
        "j",
    )
    right = cells.filter(F.col("j") < n - 1).select(
        "i", "j", F.col("i").alias("di"), (F.col("j") + 1).alias("dj")
    )
    down = cells.filter(F.col("i") < n - 1).select(
        "i", "j", (F.col("i") + 1).alias("di"), F.col("j").alias("dj")
    )
    e = (
        right.unionByName(down)
        .select(
            F.concat_ws(",", "i", "j").alias("src"),
            F.concat_ws(",", "di", "dj").alias("dst"),
            (0.1 + 0.02 * ((F.col("i") + F.col("dj")) % 3)).alias("b"),
        )
    )
    out = belief_propagation(GraphFrame(v, e), num_iter=2)
    return out.vertices.select("id", F.round("belief", 6).alias("belief"))


def q_dp_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events stream
    (datapipe/funnel.py retention): cohorts anchored at the Monday of
    each user's first event, 6 periods; counts and rates replay in SQL."""
    from graphframes_spark.datapipe import retention

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = retention(events, periods=6, period_days=7)
    # ISO-string the cohort date so the driver's value hash sees the
    # same canonical form from Spark and DuckDB (DATE round-trips
    # through pandas differently per engine)
    return out.withColumn("cohort", F.date_format("cohort", "yyyy-MM-dd"))


def q_dp_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical substring dedup (datapipe/text.py remove_duplicate_spans):
    rewrite every document with its corpus-duplicated 3-gram spans cut
    out; the oracle replays gram positions, the >= 2-distinct-doc gram
    table, coverage expansion, and the ordered re-join."""
    from graphframes_spark.datapipe import remove_duplicate_spans

    return remove_duplicate_spans(_docs(spark, sf_dir), n=3, min_docs=2)


def q_dp_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination behind a broadcast Bloom prefilter
    (datapipe/bloom.py decontaminate): docs sharing >= 2 distinct
    3-grams with the doc_id % 10 == 0 benchmark slice are dropped. The
    Bloom stage is a scan-side candidate filter with no false negatives
    and the survivors re-verify in the exact inverted-index join, so the
    output is bit-identical to the exact-only plan — which is exactly
    what the oracle replays (it knows nothing about the bloom)."""
    from graphframes_spark.datapipe import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    out = decontaminate(
        docs, bench, n=3, min_shared=2, num_bits=1 << 18, num_hashes=3
    )
    return out.select("doc_id", "lang", "source")


def q_dp_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (datapipe/dedup.py cross_corpus_dedup,
    exact mode): incoming batch = sources src0-src2, reference corpus =
    everything else; incoming docs whose normalized-content fingerprint
    already exists in the reference are dropped via one anti-join."""
    from graphframes_spark.datapipe import cross_corpus_dedup

    docs = _docs(spark, sf_dir)
    incoming = docs.filter(F.col("source").isin("src0", "src1", "src2"))
    reference = docs.filter(~F.col("source").isin("src0", "src1", "src2"))
    out = cross_corpus_dedup(incoming, reference, method="exact")
    return out.select("doc_id", "source")


def q_svdpp_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SVD++ output (lib/svdpp.py, mirroring the reference's
    SVDPlusPlus.scala): rank=2, one gradient iteration on the
    customer-order rating graph with md5-based deterministic init. The
    oracle unrolls the entire iteration — init, phase-1 implicit-factor
    fold, per-edge clamped-error gradients, message summation — as
    cascaded CTEs, hash-matching every latent factor, bias, and norm."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = customer.select(F.col("c_custkey").alias("id")).unionByName(
        orders.select((F.col("o_orderkey") + ORDER_OFFSET).alias("id"))
    )
    e = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        (F.col("o_totalprice") / 100000.0).alias("weight"),
    )
    df, _loss = GraphFrame(v, e).svdPlusPlus(rank=2, maxIter=1)
    return df.select(
        F.col("id"),
        F.round(F.element_at("column1", 1), 7).alias("f0"),
        F.round(F.element_at("column1", 2), 7).alias("f1"),
        F.round(F.element_at("column2", 1), 7).alias("i0"),
        F.round(F.element_at("column2", 2), 7).alias("i1"),
        F.round("column3", 7).alias("bias"),
        F.round("column4", 8).alias("norm"),
    )


def q_hash2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash2Vec (embeddings.py hash2vec, mirroring Hash2Vec.scala:48-584)
    on a deterministic walk set: one walk per region — its nation keys in
    ascending order — with dim=8, window=2, constant decay, L2 norm. The
    oracle replays the context windowing, signed accumulation, and
    normalization in SQL; only the 25 per-token (index, sign) hash values
    are precomputed literals (blake2b is not expressible in DuckDB)."""
    from graphframes_spark.embeddings import hash2vec

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    seqs = nation.groupBy("n_regionkey").agg(
        F.transform(
            F.array_sort(F.collect_list("n_nationkey")),
            lambda x: x.cast("string"),
        ).alias("walk")
    )
    emb = hash2vec(
        seqs,
        seq_col="walk",
        dim=8,
        window=2,
        decay="constant",
        normalize=True,
        index_seed=0,
        sign_seed=1,
    )
    return emb.select(
        F.col("id"), F.posexplode("vector").alias("pos", "val")
    ).select("id", "pos", F.round("val", 9).alias("val"))


def q_dp_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming contamination monitor
    (datapipe/streaming.py stream_contamination_flags): the operator is a
    stateless shingle explode + broadcast-Bloom prefilter + stream-static
    join + per-pair count, so running it on a batch DataFrame is the
    IDENTICAL plan minus the micro-batch scheduler. Bench slice =
    doc_id % 7 == 0; the Bloom stage has no false negatives, so the
    oracle replays only the exact inverted-index semantics."""
    from graphframes_spark.datapipe.bloom import build_bloom
    from graphframes_spark.datapipe.streaming import stream_contamination_flags
    from graphframes_spark.datapipe.text import shingles, tokenize

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    bloom = build_bloom(
        bench.select(F.explode(shingles(tokenize(F.col("text")), 3)).alias("_sh")),
        "_sh",
        num_bits=1 << 18,
        num_hashes=3,
    )
    return stream_contamination_flags(
        docs, bench, n=3, min_shared=2, bloom=bloom
    ).select("doc_id", "ref_doc_id", "n_shared")


def q_dp_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL streaming near-dup candidate filter
    (datapipe/streaming.py stream_near_dup_candidates — per-document
    1-permutation MinHash fingerprint through watermarked
    ``dropDuplicatesWithinWatermark`` first-wins dedup) end-to-end: a
    file-source stream of the documents table drained with an
    availableNow trigger into a memory sink. The projection is the
    deterministic part of the operator's contract — exactly ONE survivor
    per fingerprint group (group count + membership), and the survivor's
    identity wherever the group is a singleton (forced winner). Which
    member wins in a multi-doc group is arrival-order-dependent by
    design (first wins) and stays pytest-verified. Documents shorter
    than 3 tokens share a null fingerprint group, matching the stream's
    null-key dedup behavior."""
    import tempfile
    import uuid

    from graphframes_spark.datapipe.streaming import stream_near_dup_candidates
    from graphframes_spark.datapipe.text import minhash_fingerprint

    # event time offset past epoch 0: a row AT the initial watermark
    # (epoch 0) would be discarded as late by the stateful dedup
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.col("doc_id") + F.lit(1_600_000_000)).alias("ts"),
    )
    src_dir = tempfile.mkdtemp(prefix="dp_stream_near_dup_src_")
    docs.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    kept_stream = stream_near_dup_candidates(
        stream, ts_col="ts", text_col="text", shingle_len=3
    )
    sink = f"dp_stream_near_dup_{uuid.uuid4().hex[:12]}"
    (
        kept_stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    # fingerprint groups over the full corpus (batch side of the check)
    groups = (
        docs.select(
            F.col("doc_id"), minhash_fingerprint(F.col("text"), 3).alias("minfp")
        )
        .groupBy("minfp")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
    kept = spark.table(sink).select(
        F.col("doc_id").alias("kept_doc_id"),
        minhash_fingerprint(F.col("text"), 3).alias("minfp"),
    )
    return kept.join(groups, kept["minfp"].eqNullSafe(groups["minfp"])).select(
        groups["minfp"].alias("minfp"),
        F.col("group_size").cast("long").alias("group_size"),
        F.when(F.col("group_size") == 1, F.col("kept_doc_id")).alias(
            "unique_doc_id"
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is load-bearing: the driver's correctness harness
    verifies the FIRST 50 entries against ``oracle_sql()``.

    Round-6 rotation: rounds 1-5 accumulated driver-green rows for 64
    queries (CORRECTNESS_r01..r05), always the same head of the dict.
    This round the first 50 slots carry only never-driver-verified
    oracled queries: 46 of the 55 pre-existing ones plus the four new
    round-6 queries (hash2vec, svdpp_full, dp_stream_contamination,
    dp_stream_near_dup). All 123 oracled registry queries are locally
    green at sf0.01 (tools/check_oracles.py full run, this round). The
    nine deferred to the next rotation are family-overlaps of rows that
    are green or in-window (dp_lsh_exact / dp_ivf_exact share
    dp_ann_topk's oracle; triangles / transitivity overlap
    triangle_count; describe_graph composes verified degree stats;
    dp_temp_sample / dp_word_freq / dp_dup_coverage / dp_redact have
    in-window family siblings). Previously-green queries sit after
    position 50 — still runnable, still benchmarked, still under pytest
    and the local oracle selfcheck.
    """
    return {
        # ---- round-6 window: never-driver-verified, all oracled ----
        # graph algorithms
        "hits": q_hits,
        "betweenness": q_betweenness,
        "eigenvector": q_eigenvector,
        "katz": q_katz,
        "harmonic_centrality": q_harmonic_centrality,
        "eccentricity": q_eccentricity,
        "clustering_coefficient": q_clustering_coefficient,
        "reciprocity": q_reciprocity,
        "triad_census": q_triad_census,
        "wl_labels": q_wl_labels,
        "belief_propagation": q_belief_propagation,
        "seeded_lpa": q_seeded_lpa,
        "coloring_regions": q_coloring_regions,
        "contract_regions": q_contract_regions,
        "modularity_regions": q_modularity_regions,
        "assortativity": q_assortativity,
        "attr_assortativity": q_attr_assortativity,
        "degree_distribution": q_degree_distribution,
        "link_prediction": q_link_prediction,
        "sample_subgraph": q_sample_subgraph,
        "negative_edges": q_negative_edges,
        "split_edges": q_split_edges,
        "group_edges": q_group_edges,
        "pagerank_weighted": q_pagerank_weighted,
        "node2vec_chain": q_node2vec_chain,
        # LLM-data-pipeline tier
        "dp_funnel": q_dp_funnel,
        "dp_retention": q_dp_retention,
        "dp_lm_score": q_dp_lm_score,
        "dp_pack": q_dp_pack,
        "dp_remove_spans": q_dp_remove_spans,
        "dp_dup_spans": q_dp_dup_spans,
        "dp_bloom_decontam": q_dp_bloom_decontam,
        "dp_cross_dedup": q_dp_cross_dedup,
        "dp_dedup_corpus": q_dp_dedup_corpus,
        "dp_keep_best": q_dp_keep_best,
        "dp_sessionize": q_dp_sessionize,
        "dp_chunking": q_dp_chunking,
        "dp_balanced_sample": q_dp_balanced_sample,
        "dp_split": q_dp_split,
        "dp_source_rollup": q_dp_source_rollup,
        "dp_profile": q_dp_profile,
        "dp_normalize": q_dp_normalize,
        "dp_tfidf": q_dp_tfidf,
        "dp_boilerplate": q_dp_boilerplate,
        "dp_quantize": q_dp_quantize,
        "dp_stream_degrees": q_dp_stream_degrees,
        # round-6 additions: the last §2 component without oracle
        # evidence (hash2vec), streaming batch twins, full SVD++
        "svdpp_full": q_svdpp_full,
        "hash2vec": q_hash2vec,
        "dp_stream_contamination": q_dp_stream_contamination,
        "dp_stream_near_dup": q_dp_stream_near_dup,
        # ------------- past the driver's 50-entry correctness window:
        # displaced by the round-6 additions (in-window family
        # siblings: dp_balanced_sample/dp_split, dp_dup_spans/
        # dp_remove_spans, dp_normalize) - next rotation picks them up
        "dp_temp_sample": q_dp_temp_sample,
        "dp_word_freq": q_dp_word_freq,
        "dp_dup_coverage": q_dp_dup_coverage,
        "dp_redact": q_dp_redact,
        # driver-green in rounds 1-5 (CORRECTNESS_r01..r05), plus the
        # seeded rows-only variants and the 5 deferred family-overlaps
        "out_degrees": q_out_degrees,
        "in_degrees": q_in_degrees,
        "degrees": q_degrees,
        "triplets": q_triplets,
        "motif_negation": q_motif_negation,
        "louvain_regions": q_louvain_regions,
        "filter_vertices": q_filter_vertices,
        "filter_edges": q_filter_edges,
        "drop_isolated": q_drop_isolated,
        "as_undirected_degrees": q_as_undirected_degrees,
        "as_reversed": q_as_reversed,
        "type_out_degree": q_type_out_degree,
        "aggregate_messages": q_aggregate_messages,
        "aggregate_neighbors": q_aggregate_neighbors,
        "pregel_indegree": q_pregel_indegree,
        "bfs": q_bfs,
        "connected_components": q_connected_components,
        "scc": q_scc,
        "pagerank": q_pagerank,
        "ppr": q_ppr,
        "shortest_paths": q_shortest_paths,
        "sssp": q_sssp,
        "ktruss": q_ktruss,
        "label_propagation": q_label_propagation,
        "triangle_count": q_triangle_count,
        "kcore": q_kcore,
        "cycles": q_cycles,
        "mis_regions": q_mis_regions,
        "svdpp_norms": q_svdpp_norms,
        "pic_regions": q_pic_regions,
        "random_walk_stats": q_random_walk_stats,
        "sampling_convolution_full": q_sampling_convolution_full,
        "kmin_sampling": q_kmin_sampling,
        "pg_unify": q_pg_unify,
        "pg_projection": q_pg_projection,
        "pg_join_vertices": q_pg_join_vertices,
        "dp_exact_dedup": q_dp_exact_dedup,
        "dp_token_counts": q_dp_token_counts,
        "dp_quality": q_dp_quality,
        "dp_language_id": q_dp_language_id,
        "dp_fingerprint": q_dp_fingerprint,
        "dp_minhash_dedup": q_dp_minhash_dedup,
        "dp_ngram_pairs": q_dp_ngram_pairs,
        "dp_simhash_pairs": q_dp_simhash_pairs,
        "dp_embedding_pairs": q_dp_embedding_pairs,
        "dp_ann_topk": q_dp_ann_topk,
        "dp_repetition": q_dp_repetition,
        "dp_contamination": q_dp_contamination,
        "dp_multimodal_features": q_dp_multimodal_features,
        "dp_multimodal_meta": q_dp_multimodal_meta,
        "motif_two_hop": q_motif_two_hop,
        "pagerank_personalized": q_pagerank_personalized,
        "motif_mutual": q_motif_mutual,
        "type_in_degree": q_type_in_degree,
        "type_degree": q_type_degree,
        "pagerank_tol": q_pagerank_tol,
        "shortest_paths_undirected": q_shortest_paths_undirected,
        "triangle_count_approx": q_triangle_count_approx,
        "cc_string_labels": q_cc_string_labels,
        "cc_clique": q_cc_clique,
        "lpa_clique": q_lpa_clique,
        "pagerank_clique": q_pagerank_clique,
        "pg_copurchase": q_pg_copurchase,
        "motif_var_length": q_motif_var_length,
        "mis": q_mis,
        "random_walks": q_random_walks,
        "pic": q_pic,
        "sampling_convolution": q_sampling_convolution,
        "dp_lsh_topk": q_dp_lsh_topk,
        "dp_ivf_topk": q_dp_ivf_topk,
        "louvain_copurchase": q_louvain_copurchase,
        "dp_lsh_exact": q_dp_lsh_exact,
        "dp_ivf_exact": q_dp_ivf_exact,
        "triangles": q_triangles,
        "transitivity": q_transitivity,
        "describe_graph": q_describe_graph,
    }


# ------------------------------------------------------------------ oracles

#: brute-force cosine top-5 for queries vec_id < 10 — shared by the exact
#: ANN query and the exact-mode degenerations of the LSH / IVF paths
_ANN_EXACT_SQL = """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS sim
        FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank
    FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS rk
        FROM scored
    ) WHERE rk <= 5
"""


#: banded sign-LSH geometry for embedding near-dup (must mirror the
#: defaults of graphframes_spark.datapipe.embedding_cosine_pairs)
COSINE_PLANES_PER_BAND = 4
COSINE_BANDS = 8


def _embedding_banded_oracle_sql() -> str:
    """Replicates the banded hyperplane-LSH candidate generation
    bit-for-bit (datapipe/dedup.py banded_hyperplane_sketches): the same
    fixed-point quantization (floor(x*4096) — exact double scaling), the
    same 3-round Lehmer LCG plane components (all-int32-safe arithmetic,
    identical in DuckDB), and order-independent integer dot products, so
    the candidate set — not just the final filter — is hash-verified."""

    def w(pexpr: str, dexpr: str) -> str:
        h = f"((CAST({pexpr} AS BIGINT)*131 + CAST({dexpr} AS BIGINT) + 1) % 65521)"
        for _ in range(3):
            h = f"(({h} * 17364 + 575) % 65521)"
        return f"({h} % 2001 - 1000)"

    dots = [
        "list_sum(list_transform(range(1, len(q)+1), d -> q[d] * "
        + w(f"(band*{COSINE_PLANES_PER_BAND} + {j})", "d-1")
        + "))"
        for j in range(COSINE_PLANES_PER_BAND)
    ]
    sketch = " + ".join(
        f"(CASE WHEN ({dots[j]}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(COSINE_PLANES_PER_BAND)
    )
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS q
            FROM embeddings
        ),
        b AS (
            SELECT vec_id, v, CAST(t.range AS BIGINT) AS band, {sketch} AS sketch
            FROM e CROSS JOIN range({COSINE_BANDS}) t
        )
        SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        FROM b a JOIN b c
          ON a.band = c.band AND a.sketch = c.sketch AND a.vec_id < c.vec_id
        WHERE list_cosine_similarity(a.v, c.v) >= {COSINE_T}
    """


def _minhash_oracle_sql() -> str:
    """Replicates the MinHash-LSH pipeline bit-for-bit: same md5-based
    double-hash permutations ((h1 + p*h2) & (2^48-1) over the two md5
    halves), same banding, same Jaccard verify, components via recursive
    closure."""
    mask = (1 << 48) - 1
    sig_items = ",\n           ".join(
        "list_min(list_transform(sh, s -> "
        f"((('0x' || substr(md5(s), 1, 12))::BIGINT "
        f"+ {p} * ('0x' || substr(md5(s), 13, 12))::BIGINT) & {mask})))"
        for p in range(NUM_PERM)
    )
    band_items = ",\n           ".join(
        "md5("
        + " || '|' || ".join(
            f"sig[{b * ROWS_PER_BAND + r + 1}]" for r in range(ROWS_PER_BAND)
        )
        + f") AS b{b}"
        for b in range(NUM_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, b{b} AS bhash FROM bands" for b in range(NUM_BANDS)
    )
    return f"""
        WITH sh AS ({_DOC_SHINGLES_SQL}),
        sigs AS (SELECT doc_id, sh, [{sig_items}] AS sig FROM sh),
        bands AS (SELECT doc_id, sh, {band_items} FROM sigs),
        posting AS ({band_rows}),
        cands AS (
            SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
            FROM posting a JOIN posting b
              ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        ),
        verified AS (
            SELECT c.ia, c.ib
            FROM cands c
            JOIN sh sa ON sa.doc_id = c.ia
            JOIN sh sb ON sb.doc_id = c.ib
            WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
                  / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                  >= {JACCARD_T}
        ),
        sym AS (
            SELECT ia AS a, ib AS b FROM verified
            UNION ALL SELECT ib, ia FROM verified
        ),
        closure AS (
            WITH RECURSIVE r(id, comp) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.b, r.comp FROM r JOIN sym s ON s.a = r.id
            )
            SELECT id, min(comp) AS component FROM r GROUP BY id
        )
        SELECT id AS doc_id, component FROM closure
    """


def _simhash_oracle_sql() -> str:
    sums = ",\n               ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(48)
    )
    packed = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(48)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_distinct(list_filter(
                       string_split_regex(lower(text), '\\s+'), x -> len(x) > 0))) AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS hv FROM toks
        ),
        sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
        sim AS (SELECT doc_id, {packed} AS sim FROM sums)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= {HAMMING_T}
    """


_QUALITY_TOKENS_SQL = """
    SELECT doc_id, text,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> len(x) > 0) AS t
    FROM documents
"""

_EN_STOP = "['the','a','of','and','to','in','is','that','it','for']"
_DE_STOP = "['der','die','das','und','ist','nicht','ein','mit','auf','zu']"
_FR_STOP = "['le','la','les','et','est','une','dans','pour','que','des']"
_ES_STOP = "['el','la','los','y','es','una','en','por','que','con']"


def _hash2vec_literal_rows() -> str:
    """(token, feature-index, sign) literals for nation keys 0..24 under
    hash2vec's blake2b index/sign hashing (embeddings.py:87-91) with
    index_seed=0, sign_seed=1, dim=8 — precomputed because DuckDB cannot
    evaluate blake2b; everything else about the oracle replays in SQL."""
    import hashlib

    def h(token: str, salt: int) -> int:
        return int.from_bytes(
            hashlib.blake2b(f"{salt}:{token}".encode(), digest_size=8).digest(),
            "big",
        )

    return ", ".join(
        f"('{t}', {h(str(t), 0) % 8}, {1.0 if h(str(t), 1) & 1 else -1.0})"
        for t in range(25)
    )


def oracle_sql() -> dict[str, str]:
    return {
        "out_degrees": """
            SELECT o_custkey AS id, CAST(count(*) AS INTEGER) AS out_degree
            FROM orders GROUP BY o_custkey
        """,
        "in_degrees": f"""
            SELECT o_orderkey + {ORDER_OFFSET} AS id, CAST(count(*) AS INTEGER) AS in_degree
            FROM orders GROUP BY o_orderkey
        """,
        "degrees": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            ends AS (SELECT src AS id FROM adj UNION ALL SELECT dst FROM adj)
            SELECT id, CAST(count(*) AS INTEGER) AS degree FROM ends GROUP BY id
        """,
        "triplets": f"""
            SELECT src AS src_id, dst AS dst_id FROM ({_NATION_EDGES_SQL})
        """,
        "motif_two_hop": f"""
            WITH adj AS ({_NATION_EDGES_SQL})
            SELECT e1.src AS a_id, e1.dst AS b_id, e2.dst AS c_id
            FROM adj e1 JOIN adj e2 ON e1.dst = e2.src
        """,
        "motif_mutual": f"""
            WITH adj AS ({_NATION_EDGES_SQL})
            SELECT e1.src AS a_id, e1.dst AS b_id
            FROM adj e1 JOIN adj e2 ON e1.src = e2.dst AND e1.dst = e2.src
            WHERE e1.src < e1.dst
        """,
        "motif_negation": f"""
            WITH chain AS ({_EVENTS_CHAIN_SQL})
            SELECT e1.src AS a_id, e1.dst AS b_id
            FROM chain e1
            WHERE NOT EXISTS (
                SELECT 1 FROM chain e2 WHERE e2.src = e1.dst AND e2.dst = e1.src
            )
        """,
        "motif_var_length": f"""
            WITH chain AS ({_EVENTS_CHAIN_SQL})
            SELECT src AS a_id, dst AS b_id, 1 AS hop FROM chain
            UNION ALL
            SELECT e1.src, e2.dst, 2
            FROM chain e1 JOIN chain e2 ON e1.dst = e2.src
        """,
        "filter_vertices": f"""
            SELECT src, dst FROM ({_NATION_EDGES_SQL})
            WHERE src % 2 = 0 AND dst % 2 = 0
        """,
        "type_out_degree": f"""
            SELECT o_custkey AS id,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS INTEGER) AS deg_f,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS INTEGER) AS deg_o,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS INTEGER) AS deg_p
            FROM orders GROUP BY o_custkey
        """,
        "triangle_count": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            canon AS (
                SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
                FROM adj WHERE src <> dst
            ),
            tri AS (
                SELECT e1.s AS a, e1.d AS b, e2.d AS c
                FROM canon e1
                JOIN canon e2 ON e2.s = e1.d
                JOIN canon e3 ON e3.s = e1.s AND e3.d = e2.d
            ),
            per_vertex AS (
                SELECT a AS id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            )
            SELECT n.n_nationkey AS id,
                   CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_triangles
            FROM nation n
            LEFT JOIN (SELECT id, count(*) AS cnt FROM per_vertex GROUP BY id) t
              ON n.n_nationkey = t.id
        """,
        "connected_components": f"""
            SELECT c_custkey AS id, c_custkey AS component FROM customer
            UNION ALL
            SELECT o_orderkey + {ORDER_OFFSET}, o_custkey FROM orders
        """,
        "shortest_paths": """
            WITH seq AS (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ),
            mu AS (SELECT min(user_id) AS u FROM events),
            chainu AS (SELECT event_id, rn FROM seq, mu WHERE user_id = mu.u),
            lm AS (
                SELECT event_id AS lid, rn AS lrn FROM chainu
                WHERE rn = least(21, (SELECT max(rn) FROM chainu))
            )
            SELECT c.event_id AS id, lm.lid AS landmark,
                   CAST(lm.lrn - c.rn AS INTEGER) AS distance
            FROM chainu c, lm
            WHERE c.rn <= lm.lrn
        """,
        "label_propagation": """
            WITH seq AS (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                       lag(event_id, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag3,
                       first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS head
                FROM events
            )
            SELECT event_id AS id,
                   CASE WHEN rn > 3 THEN lag3 ELSE head END AS label
            FROM seq
        """,
        "pagerank": f"""
            WITH n AS (
                SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) AS n
            ),
            deg AS (SELECT o_custkey, count(*) AS d FROM orders GROUP BY o_custkey)
            SELECT c_custkey AS id, round(0.15 / n.n, 10) AS pagerank
            FROM customer, n
            UNION ALL
            SELECT o.o_orderkey + {ORDER_OFFSET},
                   round(0.15 / n.n + 0.85 * ((0.15 / n.n) / deg.d), 10)
            FROM orders o, n
            JOIN deg ON deg.o_custkey = o.o_custkey
        """,
        "pagerank_personalized": f"""
            WITH s AS (SELECT min(c_custkey) AS k FROM customer),
            deg AS (SELECT o_custkey, count(*) AS d FROM orders GROUP BY o_custkey)
            SELECT c_custkey AS id,
                   round(CASE WHEN c_custkey = (SELECT k FROM s) THEN 0.15 ELSE 0.0 END,
                         10) AS pagerank
            FROM customer
            UNION ALL
            SELECT o.o_orderkey + {ORDER_OFFSET},
                   round(CASE WHEN o.o_custkey = (SELECT k FROM s)
                         THEN 0.85 * (0.15 / deg.d) ELSE 0.0 END, 10)
            FROM orders o JOIN deg ON deg.o_custkey = o.o_custkey
        """,
        "pagerank_tol": """
            SELECT n_nationkey AS id,
                   round(1.0 / (SELECT count(*) FROM nation), 10) AS pagerank
            FROM nation
        """,
        "aggregate_messages": """
            SELECT o_custkey AS id,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
            FROM orders GROUP BY o_custkey
        """,
        "bfs": """
            WITH seq AS (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ),
            mu AS (SELECT min(user_id) AS u FROM events),
            chainu AS (SELECT event_id, rn FROM seq, mu WHERE user_id = mu.u)
            SELECT r1.event_id AS from_id, r2.event_id AS v1_id,
                   r3.event_id AS v2_id, r4.event_id AS to_id
            FROM chainu r1, chainu r2, chainu r3, chainu r4
            WHERE r1.rn = 1 AND r2.rn = 2 AND r3.rn = 3 AND r4.rn = 4
        """,
        # ------------------------------------------- round 2: graph tier
        "filter_edges": f"""
            SELECT src, dst FROM ({_NATION_EDGES_SQL}) WHERE src < dst
        """,
        "drop_isolated": f"""
            SELECT DISTINCT o_custkey AS id FROM orders WHERE o_totalprice > 200000
            UNION ALL
            SELECT o_orderkey + {ORDER_OFFSET} FROM orders WHERE o_totalprice > 200000
        """,
        "as_undirected_degrees": f"""
            WITH chain AS ({_EVENTS_CHAIN_SQL}),
            ends AS (SELECT src AS id FROM chain UNION ALL SELECT dst FROM chain)
            SELECT id, CAST(count(*) AS INTEGER) AS degree FROM ends GROUP BY id
        """,
        "as_reversed": f"""
            SELECT o_orderkey + {ORDER_OFFSET} AS id, CAST(1 AS INTEGER) AS n
            FROM orders
        """,
        "type_in_degree": f"""
            SELECT o_custkey AS id,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS INTEGER) AS deg_f,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS INTEGER) AS deg_o,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS INTEGER) AS deg_p
            FROM orders GROUP BY o_custkey
        """,
        "type_degree": f"""
            WITH ends AS (
                SELECT o_custkey AS id, o_orderstatus AS st FROM orders
                UNION ALL
                SELECT o_orderkey + {ORDER_OFFSET}, o_orderstatus FROM orders
            )
            SELECT id,
                   CAST(count(*) FILTER (WHERE st = 'F') AS INTEGER) AS deg_f,
                   CAST(count(*) FILTER (WHERE st = 'O') AS INTEGER) AS deg_o,
                   CAST(count(*) FILTER (WHERE st = 'P') AS INTEGER) AS deg_p
            FROM ends GROUP BY id
        """,
        "ppr": f"""
            WITH srcs AS (
                SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rk
                FROM customer ORDER BY c_custkey LIMIT 2
            ),
            s1 AS (SELECT c_custkey AS k FROM srcs WHERE rk = 1),
            s2 AS (SELECT c_custkey AS k FROM srcs WHERE rk = 2),
            deg AS (SELECT o_custkey, count(*) AS d FROM orders GROUP BY o_custkey)
            SELECT c_custkey AS id,
                   round(CASE WHEN c_custkey = (SELECT k FROM s1) THEN 0.15 ELSE 0.0 END, 10) AS ppr1,
                   round(CASE WHEN c_custkey = (SELECT k FROM s2) THEN 0.15 ELSE 0.0 END, 10) AS ppr2
            FROM customer
            UNION ALL
            SELECT o.o_orderkey + {ORDER_OFFSET},
                   round(CASE WHEN o.o_custkey = (SELECT k FROM s1)
                         THEN 0.85 * (0.15 / deg.d) ELSE 0.0 END, 10),
                   round(CASE WHEN o.o_custkey = (SELECT k FROM s2)
                         THEN 0.85 * (0.15 / deg.d) ELSE 0.0 END, 10)
            FROM orders o JOIN deg ON deg.o_custkey = o.o_custkey
        """,
        "pregel_indegree": f"""
            WITH adj AS ({_NATION_EDGES_SQL})
            SELECT n.n_nationkey AS id,
                   CAST(coalesce(t.cnt, 0) AS BIGINT) AS cnt
            FROM nation n
            LEFT JOIN (SELECT dst, count(*) AS cnt FROM adj GROUP BY dst) t
              ON n.n_nationkey = t.dst
        """,
        "kcore": """
            SELECT n.n_nationkey AS id,
                   CAST((SELECT count(*) FROM nation n2
                         WHERE n2.n_regionkey = n.n_regionkey) - 1 AS INTEGER) AS kcore
            FROM nation n
        """,
        "scc": f"""
            WITH ring AS ({_USER_CYCLES_SQL})
            SELECT event_id AS id,
                   min(event_id) OVER (PARTITION BY user_id) AS component
            FROM ring
        """,
        "cycles": f"""
            WITH ring AS ({_USER_CYCLES_SQL}),
            mins AS (
                SELECT user_id, min(event_id) AS m,
                       min(rn) FILTER (WHERE event_id = (
                           SELECT min(event_id) FROM ring r2 WHERE r2.user_id = ring.user_id
                       )) AS mrn
                FROM ring GROUP BY user_id
            ),
            rotated AS (
                SELECT r.user_id, mins.m, r.event_id,
                       (r.rn - mins.mrn + r.n) % r.n AS pos
                FROM ring r JOIN mins ON r.user_id = mins.user_id
            )
            SELECT m AS cycle_id, CAST(pos AS INTEGER) AS pos, event_id FROM rotated
            UNION ALL
            SELECT m, CAST(max(pos) + 1 AS INTEGER), m FROM rotated GROUP BY user_id, m
        """,
        "lpa_clique": """
            SELECT n.n_nationkey AS id,
                   (SELECT min(n2.n_nationkey) FROM nation n2
                    WHERE n2.n_regionkey = n.n_regionkey) AS label
            FROM nation n
        """,
        "cc_clique": """
            SELECT n.n_nationkey AS id,
                   (SELECT min(n2.n_nationkey) FROM nation n2
                    WHERE n2.n_regionkey = n.n_regionkey) AS component
            FROM nation n
        """,
        "cc_string_labels": """
            SELECT 'c' || c_custkey AS id, 'c' || c_custkey AS component FROM customer
            UNION ALL
            SELECT 'o' || o_orderkey, 'c' || o_custkey FROM orders
        """,
        "pagerank_clique": """
            SELECT n_nationkey AS id,
                   round(1.0 / (SELECT count(*) FROM nation), 10) AS pagerank
            FROM nation
        """,
        "triangle_count_approx": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            canon AS (
                SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
                FROM adj WHERE src <> dst
            ),
            tri AS (
                SELECT e1.s AS a, e1.d AS b, e2.d AS c
                FROM canon e1
                JOIN canon e2 ON e2.s = e1.d
                JOIN canon e3 ON e3.s = e1.s AND e3.d = e2.d
            ),
            per_vertex AS (
                SELECT a AS id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            )
            SELECT n.n_nationkey AS id,
                   CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_triangles
            FROM nation n
            LEFT JOIN (SELECT id, count(*) AS cnt FROM per_vertex GROUP BY id) t
              ON n.n_nationkey = t.id
        """,
        "aggregate_neighbors": f"""
            WITH adj AS ({_NATION_EDGES_SQL})
            SELECT e2.dst AS id, 2 AS hop, 2 AS n_hops
            FROM adj e1 JOIN adj e2 ON e1.dst = e2.src
            WHERE e1.src = 0
        """,
        "svdpp_norms": f"""
            WITH ends AS (
                SELECT o_custkey AS id FROM orders
                UNION ALL
                SELECT o_orderkey + {ORDER_OFFSET} FROM orders
            ),
            cnt AS (SELECT id, count(*) AS c FROM ends GROUP BY id)
            SELECT id, round(1.0 / sqrt(c), 8) AS norm FROM cnt
        """,
        "pg_unify": """
            SELECT 'suppliers' || sha256(CAST(s_suppkey AS VARCHAR)) AS id,
                   'suppliers' AS property_group
            FROM supplier
            UNION ALL
            SELECT 'nations' || sha256(CAST(n_nationkey AS VARCHAR)),
                   'nations'
            FROM nation
            UNION ALL
            SELECT 'suppliers' || sha256(CAST(s_suppkey AS VARCHAR)),
                   '_edge_src'
            FROM supplier
        """,
        "pg_projection": """
            SELECT a.s_suppkey AS s1, b.s_suppkey AS s2, 1.0 AS weight
            FROM supplier a JOIN supplier b
              ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        """,
        # --------------------------------------- round 2: datapipe tier
        "dp_exact_dedup": """
            WITH g AS (
                SELECT lang, n_chars, min(doc_id) AS canonical_id,
                       count(*) AS group_size
                FROM documents GROUP BY lang, n_chars
            )
            SELECT d.doc_id, g.canonical_id, g.group_size
            FROM documents d JOIN g ON d.lang = g.lang AND d.n_chars = g.n_chars
        """,
        "dp_token_counts": f"""
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> len(x) > 0)) AS INTEGER) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
            FROM documents
        """,
        "dp_quality": f"""
            WITH t AS ({_QUALITY_TOKENS_SQL}),
            m AS (
                SELECT doc_id, text, t,
                       len(t) AS n_tokens,
                       list_sum(list_transform(t, x -> len(x))) AS tok_chars,
                       len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct_chars,
                       len(list_filter(t, x -> list_contains({_EN_STOP}, x))) AS stop_hits
                FROM t
            )
            SELECT doc_id,
                   CAST(n_tokens AS INTEGER) AS n_tokens,
                   round(CASE WHEN n_tokens > 0
                         THEN tok_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS avg_token_len,
                   round(CASE WHEN len(text) > 0
                         THEN punct_chars / CAST(len(text) AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN n_tokens > 0
                         THEN stop_hits / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
                   (n_tokens >= 5
                    AND tok_chars / CAST(n_tokens AS DOUBLE) >= 2.0
                    AND tok_chars / CAST(n_tokens AS DOUBLE) <= 15.0
                    AND punct_chars / CAST(len(text) AS DOUBLE) <= 0.3) AS keep
            FROM m
        """,
        "dp_language_id": f"""
            WITH t AS ({_QUALITY_TOKENS_SQL}),
            scored AS (
                SELECT doc_id,
                       len(list_intersect(list_distinct(t), {_EN_STOP})) AS h_en,
                       len(list_intersect(list_distinct(t), {_DE_STOP})) AS h_de,
                       len(list_intersect(list_distinct(t), {_FR_STOP})) AS h_fr,
                       len(list_intersect(list_distinct(t), {_ES_STOP})) AS h_es
                FROM t
            ),
            best AS (
                SELECT doc_id,
                       greatest(h_en, h_de, h_fr, h_es) AS hits,
                       CASE greatest(h_en, h_de, h_fr, h_es)
                            WHEN h_fr THEN 'fr'
                            WHEN h_es THEN 'es'
                            WHEN h_en THEN 'en'
                            WHEN h_de THEN 'de'
                       END AS lang
                FROM scored
            )
            SELECT doc_id,
                   CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred
            FROM best
        """,
        "dp_fingerprint": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ),
            sh AS (
                SELECT doc_id, t,
                       list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                      FOR i IN range(1, len(t) - 1)]) AS s
                FROM t
            )
            SELECT doc_id,
                   md5(array_to_string(t, ' ')) AS fp,
                   list_min(list_transform(s, x -> md5(x))) AS minfp
            FROM sh
        """,
        "dp_minhash_dedup": _minhash_oracle_sql(),
        "dp_ngram_pairs": f"""
            WITH sh AS ({_DOC_SHINGLES_SQL})
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                  >= {JACCARD_T}
        """,
        "dp_repetition": """
            SELECT doc_id,
                   CAST(len(g) AS INTEGER) AS n_ngrams,
                   CAST(len(list_distinct(g)) AS INTEGER) AS n_distinct_ngrams,
                   round(CASE WHEN len(g) > 0
                              THEN 1.0 - len(list_distinct(g)) * 1.0 / len(g)
                              ELSE 0.0 END, 6) AS dup_frac
            FROM (
                SELECT doc_id,
                       [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))] AS g
                FROM (
                    SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> len(x) > 0) AS t
                    FROM documents
                )
            )
        """,
        "dp_contamination": f"""
            WITH sh AS ({_DOC_SHINGLES_SQL})
            SELECT a.doc_id AS doc_id, b.doc_id AS ref_doc_id,
                   CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_shared
            FROM sh a JOIN sh b
              ON b.doc_id % 10 = 0 AND a.doc_id <> b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) >= 2
        """,
        "node2vec_chain": """
            WITH seq AS (
                SELECT event_id,
                       lead(event_id, 1) OVER w AS n1,
                       lead(event_id, 2) OVER w AS n2,
                       lead(event_id, 3) OVER w AS n3,
                       lead(event_id, 4) OVER w AS n4,
                       lead(event_id, 5) OVER w AS n5
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id AS start,
                   1 AS walk_idx,
                   array_to_string(list_filter([event_id, n1, n2, n3, n4, n5],
                                               x -> x IS NOT NULL), ' ') AS walk,
                   CAST(len(list_filter([event_id, n1, n2, n3, n4, n5],
                                        x -> x IS NOT NULL)) AS INTEGER) AS walk_len
            FROM seq
            WHERE n1 IS NOT NULL
        """,
        "harmonic_centrality": """
            WITH seq AS (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ),
            mu AS (SELECT min(user_id) AS u FROM events),
            chainu AS (SELECT event_id, rn FROM seq, mu WHERE user_id = mu.u),
            lm AS (
                SELECT rn AS lrn FROM chainu
                WHERE rn = least(21, (SELECT max(rn) FROM chainu))
            )
            SELECT e.event_id AS id,
                   CAST(CASE WHEN c.rn IS NOT NULL AND c.rn < lm.lrn
                             THEN 1 ELSE 0 END AS INTEGER) AS n_reached,
                   CAST(CASE WHEN c.rn IS NOT NULL AND c.rn < lm.lrn
                             THEN lm.lrn - c.rn ELSE 0 END AS BIGINT) AS dist_sum,
                   CASE WHEN c.rn IS NOT NULL AND c.rn < lm.lrn
                        THEN round(1.0 / (lm.lrn - c.rn), 9) ELSE 0.0 END AS harmonic,
                   CASE WHEN c.rn IS NOT NULL AND c.rn < lm.lrn
                        THEN round(1.0 / (lm.lrn - c.rn), 9) ELSE 0.0 END AS closeness
            FROM events e
            LEFT JOIN chainu c ON e.event_id = c.event_id
            CROSS JOIN lm
        """,
        "dp_chunking": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, greatest(len(toks) - 17, 0), 48)) AS i
                FROM t WHERE len(toks) > 0
            )
            SELECT doc_id,
                   CAST(i // 48 AS INTEGER) AS chunk_idx,
                   CAST(len(toks[i + 1 : i + 64]) AS INTEGER) AS n_chunk_tokens,
                   array_to_string(toks[i + 1 : i + 64], ' ') AS chunk_text
            FROM s
        """,
        "dp_sessionize": """
            WITH b AS (
                SELECT user_id, ts,
                       CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts) > 3600
                            THEN 1 ELSE 0 END AS brk
                FROM events
            ), s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess
                FROM b
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        # degrees excludes edge-less vertices, so only order-bearing
        # customers and the orders themselves appear
        "degree_distribution": f"""
            WITH d AS (
                SELECT o_custkey AS id, count(*) AS degree
                FROM orders GROUP BY o_custkey
                UNION ALL
                SELECT o_orderkey + {ORDER_OFFSET} AS id, 1 AS degree
                FROM orders
            )
            SELECT degree, count(*) AS n_vertices FROM d GROUP BY degree
        """,
        # 5-cliques: every within-region edge has truss support 3, the
        # k=4 peel drops nothing, so the fixpoint is closed-form
        "ktruss": """
            SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                   CAST(3 AS BIGINT) AS support
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey
             AND a.n_nationkey < b.n_nationkey
        """,
        # lexicographic order on lowercase md5 hex IS numeric order, so
        # the 0.5 fraction is the literal '8' || 31 zeros threshold
        "sample_subgraph": f"""
            WITH v AS (
                SELECT c_custkey AS id FROM customer
                UNION ALL
                SELECT o_orderkey + {ORDER_OFFSET} AS id FROM orders
            ),
            keep AS (
                SELECT id FROM v
                WHERE md5(concat_ws(chr(31), 'r4', CAST(id AS VARCHAR)))
                      < '80000000000000000000000000000000'
            ),
            e AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
                FROM orders
            )
            SELECT e.src AS id, count(*) AS out_degree
            FROM e
            JOIN keep ks ON e.src = ks.id
            JOIN keep kd ON e.dst = kd.id
            GROUP BY e.src
        """,
        # triangles enumerated once as x<y<z over the canonical edge set;
        # coefficient = 2T / d(d-1) with distinct-neighbor degrees
        "clustering_coefficient": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS src, b.l_partkey AS dst
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            deg AS (
                SELECT id, count(*) AS d FROM (
                    SELECT src AS id FROM e UNION ALL SELECT dst FROM e
                ) GROUP BY id
            ),
            tri AS (
                SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
                FROM e e1
                JOIN e e2 ON e1.dst = e2.src
                JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
            ),
            per_v AS (
                SELECT id, count(*) AS t FROM (
                    SELECT x AS id FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri
                ) GROUP BY id
            )
            SELECT p.p_partkey AS id,
                   coalesce(per_v.t, 0) AS n_triangles,
                   round(CASE WHEN coalesce(deg.d, 0) >= 2
                              THEN 2.0 * coalesce(per_v.t, 0)
                                   / (deg.d * (deg.d - 1))
                              ELSE 0.0 END, 6) AS coefficient
            FROM part p
            LEFT JOIN per_v ON p.p_partkey = per_v.id
            LEFT JOIN deg ON p.p_partkey = deg.id
        """,
        # wedge enumeration through each undirected center, canonical
        # pair order, center degree = distinct undirected neighbors
        "link_prediction": f"""
            WITH e AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
                FROM orders
            ),
            und AS (
                SELECT src, dst FROM e
                UNION
                SELECT dst AS src, src AS dst FROM e
            ),
            deg AS (SELECT src AS w, count(*) AS d FROM und GROUP BY src),
            wedge AS (
                SELECT u1.src AS w, u1.dst AS a, u2.dst AS b
                FROM und u1 JOIN und u2 ON u1.src = u2.src AND u1.dst < u2.dst
            )
            ,
            cn AS (
                SELECT a AS id_a, b AS id_b,
                       count(*) AS common_neighbors,
                       round(sum(1.0 / ln(d)), 6) AS adamic_adar
                FROM wedge JOIN deg USING (w)
                GROUP BY a, b
            )
            SELECT cn.id_a, cn.id_b, cn.common_neighbors, cn.adamic_adar,
                   round(cn.common_neighbors * 1.0
                         / (da.d + db.d - cn.common_neighbors), 6) AS jaccard
            FROM cn
            JOIN deg da ON cn.id_a = da.w
            JOIN deg db ON cn.id_b = db.w
        """,
        # two HITS iterations unrolled: each auth/hub update is a
        # join+sum, each normalization a scalar subquery — mirrors the
        # operator's exact per-iteration normalize ordering
        "hits": """
            WITH v AS (
                SELECT s_suppkey AS id FROM supplier
                UNION ALL
                SELECT p_partkey + 10000000 AS id FROM part
            ),
            e AS (
                SELECT DISTINCT l_suppkey AS src,
                                l_partkey + 10000000 AS dst
                FROM lineitem
            ),
            ra1 AS (SELECT dst AS id, CAST(count(*) AS DOUBLE) AS raw
                    FROM e GROUP BY dst),
            a1 AS (SELECT id, raw / nullif((SELECT sqrt(sum(raw*raw)) FROM ra1), 0)
                          AS auth FROM ra1),
            rh1 AS (SELECT e.src AS id, sum(a1.auth) AS raw
                    FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
            h1 AS (SELECT id, raw / nullif((SELECT sqrt(sum(raw*raw)) FROM rh1), 0)
                          AS hub FROM rh1),
            ra2 AS (SELECT e.dst AS id, sum(h1.hub) AS raw
                    FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
            a2 AS (SELECT id, raw / nullif((SELECT sqrt(sum(raw*raw)) FROM ra2), 0)
                          AS auth FROM ra2),
            rh2 AS (SELECT e.src AS id, sum(a2.auth) AS raw
                    FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src),
            h2 AS (SELECT id, raw / nullif((SELECT sqrt(sum(raw*raw)) FROM rh2), 0)
                          AS hub FROM rh2)
            SELECT v.id,
                   round(coalesce(h2.hub, 0.0), 6) AS hub,
                   round(coalesce(a2.auth, 0.0), 6) AS authority
            FROM v
            LEFT JOIN h2 ON v.id = h2.id
            LEFT JOIN a2 ON v.id = a2.id
        """,
        # unique path per pair on a chain, so weighted SSSP distance is an
        # exact prefix-sum difference along the min-user event chain
        "sssp": """
            WITH seq AS (
                SELECT event_id, user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ),
            chain AS (
                SELECT event_id, rn, value,
                       sum(value) OVER (ORDER BY rn
                                        ROWS UNBOUNDED PRECEDING) AS cum
                FROM seq
                WHERE user_id = (SELECT min(user_id) FROM events)
            ),
            lm AS (
                SELECT event_id AS lm_id, rn AS lrn,
                       cum - value AS lbase
                FROM chain
                WHERE rn = (SELECT least(21, max(rn)) FROM chain)
            )
            SELECT c.event_id AS id, lm.lm_id AS landmark,
                   round(lm.lbase - (c.cum - c.value), 6) AS distance
            FROM chain c, lm
            WHERE c.rn <= lm.lrn
        """,
        # the Spark side runs the salted two-level tournament; the oracle is
        # the single-window definition — identical rows by construction
        "dp_balanced_sample": """
            SELECT doc_id, lang, source
            FROM (
                SELECT doc_id, lang, source,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(concat_ws(chr(31), 'r4',
                                                  CAST(doc_id AS VARCHAR))),
                                    doc_id
                       ) AS rn
                FROM documents
            )
            WHERE rn <= 20
        """,
        "dp_source_rollup": """
            WITH t AS (
                SELECT source, lang, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ), m AS (
                SELECT source, lang,
                       len(t) AS n_tokens,
                       list_sum(list_transform(t, x -> len(x))) AS tok_chars,
                       len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           AS punct_chars,
                       len(text) AS n_chars,
                       md5(array_to_string(t, ' ')) AS fp
                FROM t
            )
            SELECT source, lang,
                   count(*) AS n_docs,
                   round(avg(n_tokens), 6) AS avg_tokens,
                   round(avg(CASE WHEN n_tokens >= 5
                                  AND tok_chars / CAST(n_tokens AS DOUBLE) >= 2.0
                                  AND tok_chars / CAST(n_tokens AS DOUBLE) <= 15.0
                                  AND punct_chars / CAST(n_chars AS DOUBLE) <= 0.3
                             THEN 1.0 ELSE 0.0 END), 6) AS keep_rate,
                   count(DISTINCT fp) AS n_unique,
                   round(1.0 - count(DISTINCT fp) * 1.0 / count(*), 6) AS dup_rate
            FROM m
            GROUP BY source, lang
        """,
        "dp_simhash_pairs": _simhash_oracle_sql(),
        "dp_embedding_pairs": _embedding_banded_oracle_sql(),
        "dp_ann_topk": _ANN_EXACT_SQL,
        # exact-mode degenerations of the approximate paths: same result set
        # as brute force, so they share its oracle
        "dp_lsh_exact": _ANN_EXACT_SQL,
        "dp_ivf_exact": _ANN_EXACT_SQL,
        "mis_regions": """
            SELECT n_regionkey AS region, CAST(1 AS BIGINT) AS n_selected
            FROM nation GROUP BY n_regionkey
        """,
        "kmin_sampling": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            deg AS (SELECT src AS id, count(DISTINCT dst) AS d FROM adj GROUP BY src)
            SELECT CAST(id AS BIGINT) AS id,
                   least(3, d) AS n_sampled,
                   least(3, d) AS n_valid,
                   least(3, d) AS n_distinct
            FROM deg
        """,
        "pg_join_vertices": """
            SELECT CAST(s_suppkey AS BIGINT) AS external_id,
                   'suppliers' AS property_group,
                   CAST(1 AS INTEGER) AS degree
            FROM supplier
            UNION ALL
            SELECT CAST(n.n_nationkey AS BIGINT), 'nations',
                   CAST(coalesce(c.cnt, 0) AS INTEGER)
            FROM nation n
            LEFT JOIN (SELECT s_nationkey, count(*) AS cnt
                       FROM supplier GROUP BY s_nationkey) c
              ON n.n_nationkey = c.s_nationkey
        """,
        "shortest_paths_undirected": """
            SELECT n.n_nationkey AS id, 0 AS landmark,
                   CAST(CASE WHEN n.n_nationkey = 0 THEN 0 ELSE 1 END AS INTEGER)
                       AS distance
            FROM nation n
            WHERE n.n_regionkey =
                  (SELECT n_regionkey FROM nation WHERE n_nationkey = 0)
        """,
        "pg_copurchase": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_orders
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "random_walk_stats": """
            SELECT n_nationkey AS start_id,
                   CAST(2 AS BIGINT) AS n_walks,
                   CAST(6 AS INTEGER) AS min_len,
                   CAST(6 AS INTEGER) AS max_len,
                   CAST(0 AS BIGINT) AS off_clique
            FROM nation
        """,
        "pic_regions": """
            SELECT CAST(n.n_nationkey AS BIGINT) AS id,
                   CAST(r.rep AS BIGINT) AS cluster_rep
            FROM nation n
            JOIN (SELECT n_regionkey, min(n_nationkey) AS rep
                  FROM nation GROUP BY n_regionkey) r
              ON n.n_regionkey = r.n_regionkey
        """,
        "dp_multimodal_meta": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
                   sha256(text) AS sha256
            FROM documents
        """,
        "dp_multimodal_features": """
            WITH d AS (
                SELECT doc_id,
                       list_transform(str_split(text, ''), c -> ord(c)) AS codes,
                       greatest(length(text), 1) AS total
                FROM documents
            )
            SELECT doc_id,
                   round(len(list_filter(codes, x -> x % 16 = 0))
                         / (total * 1.0), 6) AS f0,
                   round(len(list_filter(codes, x -> x % 16 = 1))
                         / (total * 1.0), 6) AS f1
            FROM d
        """,
        "sampling_convolution_full": """
            WITH nb AS (
                SELECT a.n_nationkey AS id,
                       avg(CAST(b.n_nationkey AS DOUBLE)) AS m
                FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
                WHERE a.n_nationkey <> b.n_nationkey
                GROUP BY a.n_nationkey
            )
            SELECT id, round(m, 6) AS nbr_mean0, round(m * 2, 6) AS nbr_mean1
            FROM nb
        """,
        # Pearson over both orientations of each undirected edge; DuckDB's
        # sample corr() equals the population-moment ratio (factors cancel)
        "assortativity": f"""
            WITH e AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
                FROM orders
            ),
            und AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM e
                    UNION ALL
                    SELECT dst AS src, src AS dst FROM e
                )
            ),
            deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY src)
            SELECT round(corr(CAST(ds.d AS DOUBLE), CAST(dd.d AS DOUBLE)), 6)
                   AS assortativity
            FROM und
            JOIN deg ds ON und.src = ds.id
            JOIN deg dd ON und.dst = dd.id
        """,
        # Q = sum_c ( L_c/m - (d_c/2m)^2 ) over the id%3 partition of the
        # symmetrized nation graph
        "modularity_regions": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            und AS (SELECT DISTINCT src, dst FROM adj),
            canon AS (SELECT src, dst FROM und WHERE src < dst),
            asg AS (SELECT n_nationkey AS id, n_nationkey % 3 AS c FROM nation),
            m AS (SELECT count(*) AS m FROM canon),
            deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY src),
            dc AS (
                SELECT a.c, sum(deg.d) AS dc
                FROM deg JOIN asg a ON deg.id = a.id GROUP BY a.c
            ),
            lc AS (
                SELECT a1.c, count(*) AS lc
                FROM canon e
                JOIN asg a1 ON e.src = a1.id
                JOIN asg a2 ON e.dst = a2.id
                WHERE a1.c = a2.c GROUP BY a1.c
            )
            SELECT round(sum(
                       coalesce(lc.lc, 0) / (m.m * 1.0)
                       - (dc.dc / (2.0 * m.m)) * (dc.dc / (2.0 * m.m))
                   ), 6) AS modularity
            FROM dc LEFT JOIN lc ON dc.c = lc.c CROSS JOIN m
        """,
        # triangles recounted with a 3-way canonical-edge join; wedges
        # from distinct-neighbor degrees
        "transitivity": f"""
            WITH nedges AS (
                SELECT a.n_nationkey + {NAT_OFF} AS src,
                       b.n_nationkey + {NAT_OFF} AS dst
                FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
                WHERE a.n_nationkey <> b.n_nationkey
            ),
            alledges AS (
                SELECT src, dst FROM nedges
                UNION ALL
                SELECT c_nationkey + {NAT_OFF} AS src, c_custkey AS dst
                FROM customer
            ),
            canon AS (
                SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
                FROM alledges WHERE src <> dst
            ),
            deg AS (
                SELECT id, count(*) AS d FROM (
                    SELECT src AS id FROM canon
                    UNION ALL
                    SELECT dst AS id FROM canon
                ) GROUP BY id
            ),
            wedges AS (SELECT sum(d * (d - 1) / 2.0) AS w FROM deg),
            tri AS (
                SELECT count(*) AS t
                FROM canon e1
                JOIN canon e2 ON e2.src = e1.dst
                JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst
            )
            SELECT round(3.0 * t / w, 6) AS transitivity
            FROM tri CROSS JOIN wedges
        """,
        # md5 order, shard hash, cumulative-sum window — replayed
        "dp_pack": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(list_filter(string_split_regex(lower(text),
                            '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
                       md5(concat_ws(chr(31), 'pack',
                           CAST(doc_id AS VARCHAR))) AS r
                FROM documents
            ),
            s AS (
                SELECT *, ('0x' || substr(r, 1, 12))::BIGINT % 4 AS shard
                FROM t
            ),
            c AS (
                SELECT doc_id, shard, n_tokens,
                       sum(n_tokens) OVER (PARTITION BY shard
                                           ORDER BY r, doc_id
                                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM s
            )
            SELECT doc_id, shard,
                   CAST(floor((cum - n_tokens) * 1.0 / 256) AS BIGINT) AS bin,
                   CAST((cum - n_tokens) % 256 AS BIGINT) AS bin_pos,
                   n_tokens,
                   floor((cum - 1) * 1.0 / 256)
                       > floor((cum - n_tokens) * 1.0 / 256) AS straddles
            FROM c
        """,
        # fingerprint + token-count quality + keep window, replayed
        "dp_dedup_corpus": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS tok
                FROM documents
            ),
            g AS (
                SELECT doc_id,
                       md5(array_to_string(tok, ' ')) AS dedup_group,
                       len(tok) AS q
                FROM t
            )
            SELECT doc_id, dedup_group,
                   row_number() OVER (PARTITION BY dedup_group
                                      ORDER BY q DESC, doc_id ASC) = 1 AS keep
            FROM g
        """,
        # split/threshold/rebuild replay; string_agg skips the
        # boilerplate rows exactly like collect_list skips nulls
        "dp_boilerplate": """
            WITH segs AS (
                SELECT doc_id, unnest(l) AS seg,
                       unnest(range(1, len(l) + 1)) AS pos
                FROM (SELECT doc_id, string_split(text, ' ') AS l
                      FROM documents)
            ),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            boiler AS (
                SELECT trim(seg) AS segment
                FROM segs WHERE len(trim(seg)) > 0
                GROUP BY trim(seg)
                HAVING count(DISTINCT doc_id) >= 2
                   AND count(DISTINCT doc_id) >= 0.5 * (SELECT n_docs FROM n)
            ),
            marked AS (
                SELECT s.doc_id, s.pos, s.seg,
                       b.segment IS NOT NULL AS is_boiler
                FROM segs s LEFT JOIN boiler b ON trim(s.seg) = b.segment
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT is_boiler THEN seg END,
                                       ' ' ORDER BY pos), '') AS text,
                   count(*) AS n_segments,
                   count(*) FILTER (WHERE is_boiler) AS n_removed
            FROM marked GROUP BY doc_id
        """,
        # interpolated percentiles replayed with quantile_cont
        "dp_profile": """
            WITH t AS (
                SELECT source,
                       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> len(x) > 0)) AS DOUBLE) AS tok,
                       CAST(len(text) AS DOUBLE) AS ch
                FROM documents
            )
            SELECT source, count(*) AS n_docs,
                   round(quantile_cont(tok, 0.25), 6) AS tokens_p25,
                   round(quantile_cont(tok, 0.50), 6) AS tokens_p50,
                   round(quantile_cont(tok, 0.75), 6) AS tokens_p75,
                   round(quantile_cont(tok, 0.95), 6) AS tokens_p95,
                   round(quantile_cont(ch, 0.25), 6) AS chars_p25,
                   round(quantile_cont(ch, 0.50), 6) AS chars_p50,
                   round(quantile_cont(ch, 0.75), 6) AS chars_p75,
                   round(quantile_cont(ch, 0.95), 6) AS chars_p95
            FROM t GROUP BY source
        """,
        # hourly buckets + endpoint explode replayed with time_bucket
        "dp_stream_degrees": f"""
            WITH e AS (
                SELECT user_id + {USER_OFF} AS src, event_id AS dst, ts
                FROM events
            ),
            ends AS (
                SELECT ts, src AS id, 1 AS o, 0 AS i FROM e
                UNION ALL
                SELECT ts, dst AS id, 0 AS o, 1 AS i FROM e
            )
            SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                            '%Y-%m-%d %H:%M:%S') AS w_start, id,
                   CAST(sum(o) AS BIGINT) AS out_degree,
                   CAST(sum(i) AS BIGINT) AS in_degree,
                   count(*) AS degree
            FROM ends GROUP BY 1, 2
        """,
        # every describe() statistic as a plain SQL aggregate
        "describe_graph": f"""
            WITH v AS (
                SELECT c_custkey AS id FROM customer
                UNION ALL
                SELECT o_orderkey + {ORDER_OFFSET} AS id FROM orders
            ),
            e AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
                FROM orders
            ),
            nv AS (SELECT count(*) AS n_vertices FROM v),
            ne AS (
                SELECT count(*) AS n_edges,
                       count(*) FILTER (WHERE src = dst) AS n_self_loops
                FROM e
            ),
            de AS (
                SELECT count(*) AS n_distinct_edges
                FROM (SELECT DISTINCT src, dst FROM e WHERE src <> dst)
            ),
            iso AS (
                SELECT count(*) AS n_isolated FROM v
                WHERE v.id NOT IN (SELECT src FROM e)
                  AND v.id NOT IN (SELECT dst FROM e)
            ),
            od AS (
                SELECT coalesce(max(d), 0) AS max_out_degree
                FROM (SELECT count(*) AS d FROM e GROUP BY src)
            ),
            idg AS (
                SELECT coalesce(max(d), 0) AS max_in_degree
                FROM (SELECT count(*) AS d FROM e GROUP BY dst)
            )
            SELECT n_vertices, n_edges, n_distinct_edges, n_self_loops,
                   n_isolated,
                   round(n_distinct_edges * 1.0
                         / (n_vertices * 1.0 * (n_vertices - 1)), 9) AS density,
                   round(n_edges * 1.0 / n_vertices, 6) AS avg_out_degree,
                   max_out_degree, max_in_degree
            FROM nv CROSS JOIN ne CROSS JOIN de CROSS JOIN iso
            CROSS JOIN od CROSS JOIN idg
        """,
        # mixing-matrix trace + marginal squares over symmetrized ends
        "attr_assortativity": f"""
            WITH alledges AS (
                SELECT a.n_nationkey + {NAT_OFF} AS src,
                       b.n_nationkey + {NAT_OFF} AS dst
                FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
                WHERE a.n_nationkey <> b.n_nationkey
                UNION ALL
                SELECT c_nationkey + {NAT_OFF} AS src, c_custkey AS dst
                FROM customer
            ),
            und AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM alledges WHERE src <> dst
                    UNION ALL
                    SELECT dst AS src, src AS dst FROM alledges
                    WHERE src <> dst
                )
            ),
            attr AS (
                SELECT n_nationkey + {NAT_OFF} AS id, 'n' AS a FROM nation
                UNION ALL
                SELECT c_custkey AS id, 'c' AS a FROM customer
            ),
            ann AS (
                SELECT s.a AS asrc, d.a AS adst
                FROM und u
                JOIN attr s ON u.src = s.id
                JOIN attr d ON u.dst = d.id
            ),
            tot AS (
                SELECT count(*) AS n,
                       count(*) FILTER (WHERE asrc = adst) AS tr
                FROM ann
            ),
            ss AS (
                SELECT sum(c * c) AS ss FROM (
                    SELECT CAST(count(*) AS DOUBLE) AS c
                    FROM ann GROUP BY asrc
                )
            )
            SELECT round((tr * 1.0 / n - ss / (n * 1.0 * n))
                         / (1 - ss / (n * 1.0 * n)), 6) AS assortativity
            FROM tot CROSS JOIN ss
        """,
        # degree-pair md5 colors + one (hash-sum, count) refinement,
        # replayed with DuckDB's 0x-hex BIGINT cast
        "wl_labels": f"""
            WITH v AS (
                SELECT n_nationkey + {NAT_OFF} AS id FROM nation
                UNION ALL SELECT c_custkey FROM customer
            ),
            e AS (
                SELECT a.n_nationkey + {NAT_OFF} AS src,
                       b.n_nationkey + {NAT_OFF} AS dst
                FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
                WHERE a.n_nationkey <> b.n_nationkey
                UNION ALL
                SELECT c_nationkey + {NAT_OFF} AS src, c_custkey AS dst
                FROM customer
            ),
            ind AS (SELECT dst AS id, count(*) AS i FROM e GROUP BY dst),
            outd AS (SELECT src AS id, count(*) AS o FROM e GROUP BY src),
            c0 AS (
                SELECT v.id, md5(coalesce(i, 0) || ':' || coalesce(o, 0)) AS c
                FROM v
                LEFT JOIN ind ON v.id = ind.id
                LEFT JOIN outd ON v.id = outd.id
            ),
            h0 AS (
                SELECT id, c, ('0x' || substr(c, 1, 12))::BIGINT AS h FROM c0
            ),
            m AS (
                SELECT e.dst AS id, h0.h, 'i' AS d
                FROM e JOIN h0 ON h0.id = e.src
                UNION ALL
                SELECT e.src AS id, h0.h, 'o' AS d
                FROM e JOIN h0 ON h0.id = e.dst
            ),
            a AS (
                SELECT id,
                       coalesce(sum(CASE WHEN d = 'i' THEN h END), 0) AS isum,
                       count(CASE WHEN d = 'i' THEN 1 END) AS icnt,
                       coalesce(sum(CASE WHEN d = 'o' THEN h END), 0) AS osum,
                       count(CASE WHEN d = 'o' THEN 1 END) AS ocnt
                FROM m GROUP BY id
            )
            SELECT c0.id,
                   md5(c0.c || '|' || coalesce(a.isum, 0) || ':'
                       || coalesce(a.icnt, 0) || '|' || coalesce(a.osum, 0)
                       || ':' || coalesce(a.ocnt, 0)) AS wl_label
            FROM c0 LEFT JOIN a ON c0.id = a.id
        """,
        # out-tree spreading: label = ancestor region key, closed form
        "seeded_lpa": f"""
            SELECT r_regionkey + {REG_OFF} AS id, r_regionkey AS label
            FROM region
            UNION ALL
            SELECT n_nationkey + {NAT_OFF} AS id, n_regionkey AS label
            FROM nation
            UNION ALL
            SELECT c.c_custkey AS id, n.n_regionkey AS label
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        # canonicalize + community joins + aggregate, replayed verbatim
        "contract_regions": f"""
            WITH adj AS ({_NATION_EDGES_SQL}),
            ce AS (
                SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                       CAST(count(*) AS DOUBLE) AS w
                FROM adj GROUP BY 1, 2
            ),
            asg AS (SELECT n_nationkey AS id, n_regionkey AS c FROM nation)
            SELECT least(ma.c, mb.c) AS src, greatest(ma.c, mb.c) AS dst,
                   round(sum(ce.w), 6) AS weight
            FROM ce
            JOIN asg ma ON ce.a = ma.id
            JOIN asg mb ON ce.b = mb.id
            GROUP BY 1, 2
        """,
        # md5 threshold on the src:dst pair key, replayed verbatim
        "split_edges": f"""
            SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst,
                   CASE
                       WHEN md5(concat_ws(chr(31), 'r4',
                                CAST(o_custkey AS VARCHAR) || ':' ||
                                CAST(o_orderkey + {ORDER_OFFSET} AS VARCHAR)))
                            < 'ccccccccccccd0000000000000000000' THEN 'train'
                       ELSE 'test'
                   END AS split
            FROM orders
        """,
        # bucketed md5 tournament + anti-join, replayed row-for-row
        "negative_edges": f"""
            WITH v AS (SELECT n_nationkey AS id FROM nation),
            edges AS ({_NATION_EDGES_SQL}),
            pool AS (
                SELECT id AS cand,
                       ('0x' || substr(md5('neg:' || id), 1, 12))::BIGINT % 4
                       AS b
                FROM v
            ),
            props AS (
                SELECT v.id AS src, s.slot,
                       ('0x' || substr(md5('neg:' || v.id || ':' || s.slot),
                                       1, 12))::BIGINT % 4 AS b
                FROM v, (SELECT unnest([0, 1, 2]) AS slot) s
            ),
            ranked AS (
                SELECT p.src, p.slot, pool.cand,
                       row_number() OVER (
                           PARTITION BY p.src, p.slot
                           ORDER BY ('0x' || substr(md5('neg:' || p.src || ':'
                                     || p.slot || ':' || pool.cand), 1, 12)
                                     )::BIGINT,
                                    pool.cand
                       ) AS rn
                FROM props p JOIN pool ON p.b = pool.b
                WHERE pool.cand <> p.src
            )
            SELECT DISTINCT r.src, r.cand AS dst
            FROM ranked r
            WHERE r.rn = 1
              AND NOT EXISTS (
                  SELECT 1 FROM edges e
                  WHERE e.src = r.src AND e.dst = r.cand
              )
        """,
        # disjoint cliques: Louvain = one community per region, labeled
        # by its smallest member
        "louvain_regions": """
            SELECT n_nationkey AS id,
                   min(n_nationkey) OVER (PARTITION BY n_regionkey) AS community
            FROM nation
        """,
        # walks_k via cascaded joins; katz = sum alpha^k * walks_k
        "katz": f"""
            WITH chain AS ({_EVENTS_CHAIN_SQL}),
            w1 AS (SELECT dst AS id, count(*) AS w FROM chain GROUP BY dst),
            w2 AS (
                SELECT c.dst AS id, sum(w1.w) AS w
                FROM chain c JOIN w1 ON w1.id = c.src GROUP BY c.dst
            ),
            w3 AS (
                SELECT c.dst AS id, sum(w2.w) AS w
                FROM chain c JOIN w2 ON w2.id = c.src GROUP BY c.dst
            )
            SELECT e.event_id AS id,
                   round(CAST(0.1 AS DOUBLE) * coalesce(w1.w, 0)
                         + CAST(0.01 AS DOUBLE) * coalesce(w2.w, 0)
                         + CAST(0.001 AS DOUBLE) * coalesce(w3.w, 0), 6) AS katz
            FROM events e
            LEFT JOIN w1 ON w1.id = e.event_id
            LEFT JOIN w2 ON w2.id = e.event_id
            LEFT JOIN w3 ON w3.id = e.event_id
        """,
        "reciprocity": f"""
            WITH fwd AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
                FROM orders
            ),
            back AS (
                SELECT o_orderkey + {ORDER_OFFSET} AS src, o_custkey AS dst
                FROM orders WHERE o_orderkey % 3 = 0
            ),
            e AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT * FROM fwd UNION ALL SELECT * FROM back
                ) WHERE src <> dst
            ),
            mutual AS (
                SELECT count(*) AS mu FROM e a
                WHERE EXISTS (
                    SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src
                )
            ),
            total AS (SELECT count(*) AS tot FROM e)
            SELECT round(mu * 1.0 / tot, 6) AS reciprocity
            FROM mutual CROSS JOIN total
        """,
        # same regex replayed under RE2 ('g' = Spark's always-global)
        "dp_normalize": """
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS normalized
                FROM documents
            )
            SELECT doc_id, normalized, md5(normalized) AS norm_md5 FROM n
        """,
        "dp_redact": r"""
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
                               '<EMAIL>', 'g'),
                           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                           '<IP>', 'g'),
                       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b',
                       '<PHONE>', 'g') AS redacted_text,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+'))
                       AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(text,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS INTEGER) AS n_ips,
                   CAST(len(regexp_extract_all(text,
                       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b'))
                       AS INTEGER) AS n_phones
            FROM documents
        """,
        "dp_tfidf": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split_regex(lower(text), '\s+'),
                           t -> len(t) > 0)) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term
            ),
            dfreq AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM toks GROUP BY term
            ),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       round(tf.tf * ln(n.n / (1.0 * dfreq.df)), 6) AS score
                FROM tf JOIN dfreq USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, score, CAST(rk AS INTEGER) AS rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
                FROM scored
            ) WHERE rk <= 5
        """,
        # out-tree Brandes: sigma=1 and delta(v)=#descendants, so a
        # nation's betweenness is its customer count; roots and leaves 0
        "betweenness": f"""
            WITH v AS (
                SELECT r_regionkey + {REG_OFF} AS id FROM region
                UNION ALL SELECT n_nationkey + {NAT_OFF} FROM nation
                UNION ALL SELECT c_custkey FROM customer
            ),
            bc AS (
                SELECT c_nationkey + {NAT_OFF} AS id,
                       CAST(count(*) AS DOUBLE) AS b
                FROM customer GROUP BY c_nationkey
            )
            SELECT v.id, round(coalesce(bc.b, 0.0), 6) AS betweenness
            FROM v LEFT JOIN bc USING (id)
        """,
        # chain: farthest vertex reaching the landmark is the chain head
        "eccentricity": """
            WITH seq AS (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ),
            mu AS (SELECT min(user_id) AS u FROM events),
            chainu AS (SELECT event_id, rn FROM seq, mu WHERE user_id = mu.u),
            lm AS (
                SELECT event_id AS lid, rn AS lrn FROM chainu
                WHERE rn = least(21, (SELECT max(rn) FROM chainu))
            )
            SELECT lid AS landmark,
                   CAST(lrn - 1 AS INTEGER) AS eccentricity,
                   CAST(lrn AS BIGINT) AS n_reached
            FROM lm
        """,
        # element-for-element absmax int8 replay; all-zero vectors -> 0s
        "dp_quantize": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            m AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS absmax
                FROM e
            )
            SELECT vec_id,
                   CASE WHEN absmax > 0 THEN
                       array_to_string(list_transform(v,
                           x -> CAST(CAST(round(x * 127.0 / absmax) AS INTEGER) AS VARCHAR)), ' ')
                   ELSE
                       array_to_string(list_transform(v, x -> '0'), ' ')
                   END AS qvec_str,
                   round(CASE WHEN absmax > 0 THEN absmax / 127.0 ELSE 0.0 END, 9)
                   AS scale
            FROM m
        """,
        # seeded-md5 threshold chain replayed verbatim (98/1/1)
        "dp_split": """
            SELECT doc_id,
                   CASE
                       WHEN md5(concat_ws(chr(31), 'r4', CAST(doc_id AS VARCHAR)))
                            < 'fae147ae147ae0000000000000000000' THEN 'train'
                       WHEN md5(concat_ws(chr(31), 'r4', CAST(doc_id AS VARCHAR)))
                            < 'fd70a3d70a3d70000000000000000000' THEN 'val'
                       ELSE 'test'
                   END AS split
            FROM documents
        """,
        # one winner per exact-content fingerprint group
        "dp_keep_best": """
            WITH t AS (
                SELECT doc_id, n_chars,
                       md5(array_to_string(
                           list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> len(x) > 0), ' ')) AS fp
                FROM documents
            )
            SELECT doc_id, fp,
                   row_number() OVER (
                       PARTITION BY fp ORDER BY n_chars DESC, doc_id ASC
                   ) = 1 AS keep
            FROM t
        """,
        # 2-iteration closed form: customers settle at alpha/n after one
        # superstep; orders then get alpha/n + (1-alpha)(alpha/n)(w/sum_w)
        "pagerank_weighted": f"""
            WITH n AS (
                SELECT (SELECT count(*) FROM customer)
                       + (SELECT count(*) FROM orders) AS n
            ),
            ws AS (
                SELECT o_custkey, sum(o_totalprice) AS s
                FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey AS id, round(0.15 / n.n, 10) AS pagerank
            FROM customer, n
            UNION ALL
            SELECT o.o_orderkey + {ORDER_OFFSET},
                   round(0.15 / n.n
                         + 0.85 * (0.15 / n.n) * (o.o_totalprice / ws.s), 10)
            FROM orders o JOIN ws ON o.o_custkey = ws.o_custkey, n
        """,
        # JP on a clique colors in strict priority order: color = rank-1
        "coloring_regions": """
            SELECT n_nationkey AS id,
                   CAST(row_number() OVER (
                       PARTITION BY n_regionkey
                       ORDER BY md5(concat_ws(chr(31), 'r4',
                                    CAST(n_nationkey AS VARCHAR))) DESC,
                                n_nationkey DESC
                   ) - 1 AS INTEGER) AS color
            FROM nation
        """,
        "triangles": """
            SELECT a.n_nationkey AS a, b.n_nationkey AS b, c.n_nationkey AS c
            FROM nation a
            JOIN nation b ON a.n_regionkey = b.n_regionkey
                         AND a.n_nationkey < b.n_nationkey
            JOIN nation c ON a.n_regionkey = c.n_regionkey
                         AND b.n_nationkey < c.n_nationkey
        """,
        # 3-step power iteration replayed as cascaded walk-count joins,
        # L2-normalized once at the end (mirrors the Spark plan exactly)
        "eigenvector": """
            WITH chain AS (
                SELECT c_custkey AS src, c_custkey % 97 + 1 AS dst
                FROM customer WHERE c_custkey <> c_custkey % 97 + 1
            ),
            w1 AS (SELECT dst AS id, count(*) AS w FROM chain GROUP BY dst),
            w2 AS (
                SELECT c.dst AS id, sum(w1.w) AS w
                FROM chain c JOIN w1 ON w1.id = c.src GROUP BY c.dst
            ),
            w3 AS (
                SELECT c.dst AS id, sum(w2.w) AS w
                FROM chain c JOIN w2 ON w2.id = c.src GROUP BY c.dst
            ),
            x AS (
                SELECT c.c_custkey AS id,
                       CAST(coalesce(w3.w, 0) AS DOUBLE) AS x
                FROM customer c LEFT JOIN w3 ON w3.id = c.c_custkey
            ),
            nrm AS (SELECT sqrt(sum(x.x * x.x)) AS n FROM x)
            SELECT x.id, round(x.x / nrm.n, 6) AS eigenvector
            FROM x CROSS JOIN nrm
        """,
        "group_edges": f"""
            SELECT l_suppkey AS src, l_partkey + {PART_OFFSET} AS dst,
                   CAST(count(*) AS BIGINT) AS n_lineitems,
                   round(sum(l_quantity), 6) AS sum_qty
            FROM lineitem
            GROUP BY 1, 2
        """,
        # dyad census + labeled triangles on the partially-directed
        # nation cliques (edge kept iff a < b or (a + b) % 3 = 0)
        "triad_census": """
            WITH e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
                WHERE a.n_nationkey < b.n_nationkey
                   OR (a.n_nationkey + b.n_nationkey) % 3 = 0
            ),
            n AS (SELECT count(*) AS nv FROM nation),
            m AS (
                SELECT count(*) / 2 AS mutual FROM e a
                WHERE EXISTS (
                    SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src
                )
            ),
            t AS (SELECT count(*) AS edges FROM e),
            cyc AS (
                SELECT count(*) / 3 AS c FROM e ab
                JOIN e bc ON bc.src = ab.dst
                JOIN e ca ON ca.src = bc.dst AND ca.dst = ab.src
                WHERE ab.src <> bc.dst
            ),
            tr AS (
                SELECT count(*) AS c FROM e ab
                JOIN e bc ON bc.src = ab.dst
                JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
                WHERE ab.src <> bc.dst
            )
            SELECT CAST(m.mutual AS BIGINT) AS mutual_dyads,
                   CAST(t.edges - 2 * m.mutual AS BIGINT) AS asym_dyads,
                   CAST(n.nv * (n.nv - 1) / 2
                        - (t.edges - m.mutual) AS BIGINT) AS null_dyads,
                   CAST(cyc.c AS BIGINT) AS cyclic_triangles,
                   CAST(tr.c AS BIGINT) AS transitive_triangles
            FROM n CROSS JOIN m CROSS JOIN t CROSS JOIN cyc CROSS JOIN tr
        """,
        "dp_dup_spans": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                               FOR i IN range(1, len(t) - 1)]) AS gram
                FROM toks WHERE len(t) >= 3
            ),
            per_doc AS (
                SELECT gram, doc_id, count(*) AS occ
                FROM grams GROUP BY gram, doc_id
            )
            SELECT gram,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(occ) AS BIGINT) AS n_occurrences
            FROM per_doc GROUP BY gram HAVING count(*) >= 2
        """,
        "dp_word_freq": """
            WITH toks AS (
                SELECT unnest(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> len(x) > 0)) AS token
                FROM documents
            ),
            counts AS (
                SELECT token, CAST(count(*) AS BIGINT) AS count
                FROM toks GROUP BY token HAVING count(*) >= 2
            ),
            tot AS (SELECT sum(count) AS t FROM counts)
            SELECT token, count,
                   CAST(row_number() OVER (ORDER BY count DESC, token ASC)
                        AS INTEGER) AS rank,
                   round(count * 1.0 / tot.t, 9) AS frequency
            FROM counts CROSS JOIN tot
        """,
        # per-source keep rates w^tau / sum(w^tau) * target * N / n_s
        # (capped at 1), membership by the seeded md5 12-hex-digit unit
        "dp_temp_sample": """
            WITH c AS (
                SELECT source, count(*) AS n FROM documents GROUP BY source
            ),
            a AS (SELECT source, n, pow(n * 1.0, 0.5) AS w FROM c),
            t AS (SELECT sum(w) AS tw, sum(n) AS tn FROM a),
            r AS (
                SELECT a.source,
                       least(1.0, (a.w / t.tw) * 0.5 * t.tn / a.n) AS rate
                FROM a CROSS JOIN t
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN r ON r.source = d.source
            WHERE ('0x' || substr(md5(concat_ws(chr(31), 'mix',
                       CAST(d.doc_id AS VARCHAR))), 1, 12))::BIGINT
                  / CAST(281474976710656 AS DOUBLE) < r.rate
        """,
        "dp_dup_coverage": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) >= 3
                            THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  FOR i IN range(1, len(t) - 1)]
                            ELSE [] END AS g
                FROM toks
            ),
            per_doc AS (
                SELECT doc_id, unnest(g) AS gram FROM grams
            ),
            doc_gram AS (
                SELECT doc_id, gram, count(*) AS occ
                FROM per_doc GROUP BY doc_id, gram
            ),
            dup AS (
                SELECT gram FROM doc_gram GROUP BY gram
                HAVING count(*) >= 2
            ),
            dup_per_doc AS (
                SELECT dg.doc_id, sum(dg.occ) AS nd
                FROM doc_gram dg JOIN dup ON dup.gram = dg.gram
                GROUP BY dg.doc_id
            )
            SELECT g.doc_id,
                   CAST(len(g.g) AS INTEGER) AS n_grams,
                   CAST(coalesce(d.nd, 0) AS BIGINT) AS n_dup_grams,
                   round(CASE WHEN len(g.g) > 0
                              THEN coalesce(d.nd, 0) * 1.0 / len(g.g)
                              ELSE 0.0 END, 9) AS dup_coverage
            FROM grams g LEFT JOIN dup_per_doc d ON d.doc_id = g.doc_id
        """,
        # the oracle replays only the EXACT contamination semantics —
        # the Spark side's Bloom prefilter is invisible by construction
        # (no false negatives; false positives die in the exact verify)
        "dp_bloom_decontam": f"""
            WITH sh AS ({_DOC_SHINGLES_SQL}),
            contaminated AS (
                SELECT DISTINCT a.doc_id
                FROM sh a JOIN sh b
                  ON b.doc_id % 10 = 0 AND a.doc_id <> b.doc_id
                WHERE len(list_intersect(a.sh, b.sh)) >= 2
            )
            SELECT d.doc_id, d.lang, d.source
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        """,
        "dp_cross_dedup": """
            WITH fp AS (
                SELECT doc_id, source,
                       md5(array_to_string(
                           list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> len(x) > 0), ' ')) AS fp
                FROM documents
            ),
            ref AS (
                SELECT DISTINCT fp FROM fp
                WHERE source NOT IN ('src0', 'src1', 'src2')
            )
            SELECT doc_id, source
            FROM fp
            WHERE source IN ('src0', 'src1', 'src2')
              AND fp NOT IN (SELECT fp FROM ref)
        """,
        # gram positions are 1-based here (Spark side is 0-based); only
        # the covered token SET matters, so the bases cancel
        "dp_remove_spans": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) >= 3
                            THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  FOR i IN range(1, len(t) - 1)]
                            ELSE [] END AS g
                FROM toks
            ),
            pd AS (
                SELECT doc_id, unnest(g) AS gram,
                       unnest(range(1, len(g) + 1)) AS gpos
                FROM grams
            ),
            dupg AS (
                SELECT gram FROM pd
                GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
            ),
            cov AS (
                SELECT DISTINCT doc_id, pos FROM (
                    SELECT pd.doc_id,
                           unnest(range(gpos, gpos + 3)) AS pos
                    FROM pd JOIN dupg USING (gram)
                )
            ),
            tp AS (
                SELECT doc_id, unnest(t) AS tok,
                       unnest(range(1, len(t) + 1)) AS pos
                FROM toks
            ),
            keptagg AS (
                SELECT tp.doc_id,
                       string_agg(tok, ' ' ORDER BY tp.pos) AS txt,
                       count(*) AS n_kept
                FROM tp LEFT JOIN cov
                  ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
                WHERE cov.doc_id IS NULL
                GROUP BY tp.doc_id
            )
            SELECT toks.doc_id,
                   coalesce(k.txt, '') AS text,
                   CAST(len(toks.t) AS INTEGER) AS n_tokens,
                   CAST(len(toks.t) - coalesce(k.n_kept, 0) AS BIGINT)
                       AS n_removed
            FROM toks LEFT JOIN keptagg k ON k.doc_id = toks.doc_id
        """,
        "dp_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t
                FROM events WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1 ON s1.user_id = e.user_id
                WHERE e.event_type = 'click'
                  AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL '86400 seconds'
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2 ON s2.user_id = e.user_id
                WHERE e.event_type = 'purchase'
                  AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL '86400 seconds'
                GROUP BY e.user_id
            )
            SELECT 1 AS step, 'view' AS event_type,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL
            SELECT 2, 'click', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        """,
        "dp_retention": """
            WITH firsts AS (
                SELECT user_id, min(ts) AS f FROM events GROUP BY user_id
            ),
            cohorts AS (
                SELECT user_id, CAST(date_trunc('week', f) AS DATE) AS cohort
                FROM firsts
            ),
            sizes AS (
                SELECT cohort, count(*) AS n_cohort FROM cohorts GROUP BY cohort
            ),
            activity AS (
                SELECT DISTINCT c.cohort,
                       CAST(floor(date_diff('day', c.cohort,
                                            CAST(e.ts AS DATE)) / 7)
                            AS INTEGER) AS period,
                       e.user_id
                FROM events e JOIN cohorts c USING (user_id)
                WHERE date_diff('day', c.cohort, CAST(e.ts AS DATE)) / 7 < 6
            ),
            active AS (
                SELECT cohort, period, count(*) AS n_active
                FROM activity GROUP BY cohort, period
            )
            SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort,
                   a.period, s.n_cohort, a.n_active,
                   round(a.n_active * 1.0 / s.n_cohort, 9) AS retention
            FROM active a JOIN sizes s USING (cohort)
        """,
        # 4 unrolled color steps (2 iterations x 2 colors); every grid
        # vertex has a neighbor, so the aggMess-null branch never fires
        "belief_propagation": """
            WITH cells AS (
                SELECT i.range AS i, j.range AS j
                FROM range(5) i, range(5) j
            ),
            v AS (
                SELECT i || ',' || j AS id,
                       ((i * 5 + j) % 7 - 3) / 2.0 AS a,
                       (i + j) % 2 AS color
                FROM cells
            ),
            e AS (
                SELECT i || ',' || j AS src,
                       i || ',' || (j + 1) AS dst,
                       0.1 + 0.02 * ((i + j + 1) % 3) AS b
                FROM cells WHERE j < 4
                UNION ALL
                SELECT i || ',' || j AS src,
                       (i + 1) || ',' || j AS dst,
                       0.1 + 0.02 * ((i + j) % 3) AS b
                FROM cells WHERE i < 4
            ),
            und AS (
                SELECT src AS x, dst AS y, b FROM e
                UNION ALL
                SELECT dst AS x, src AS y, b FROM e
            ),
            b0 AS (SELECT id, a, color, 0.0 AS belief FROM v),
            b1 AS (
                SELECT p.id, p.a, p.color,
                       CASE WHEN p.color = 0
                            THEN 1.0 / (1.0 + exp(-(p.a + m.s)))
                            ELSE p.belief END AS belief
                FROM b0 p JOIN (
                    SELECT und.x AS id, sum(und.b * q.belief) AS s
                    FROM und JOIN b0 q ON q.id = und.y GROUP BY und.x
                ) m ON m.id = p.id
            ),
            b2 AS (
                SELECT p.id, p.a, p.color,
                       CASE WHEN p.color = 1
                            THEN 1.0 / (1.0 + exp(-(p.a + m.s)))
                            ELSE p.belief END AS belief
                FROM b1 p JOIN (
                    SELECT und.x AS id, sum(und.b * q.belief) AS s
                    FROM und JOIN b1 q ON q.id = und.y GROUP BY und.x
                ) m ON m.id = p.id
            ),
            b3 AS (
                SELECT p.id, p.a, p.color,
                       CASE WHEN p.color = 0
                            THEN 1.0 / (1.0 + exp(-(p.a + m.s)))
                            ELSE p.belief END AS belief
                FROM b2 p JOIN (
                    SELECT und.x AS id, sum(und.b * q.belief) AS s
                    FROM und JOIN b2 q ON q.id = und.y GROUP BY und.x
                ) m ON m.id = p.id
            ),
            b4 AS (
                SELECT p.id, p.a, p.color,
                       CASE WHEN p.color = 1
                            THEN 1.0 / (1.0 + exp(-(p.a + m.s)))
                            ELSE p.belief END AS belief
                FROM b3 p JOIN (
                    SELECT und.x AS id, sum(und.b * q.belief) AS s
                    FROM und JOIN b3 q ON q.id = und.y GROUP BY und.x
                ) m ON m.id = p.id
            )
            SELECT id, round(belief, 6) AS belief FROM b4
        """,
        "dp_lm_score": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0) AS t
                FROM documents
            ),
            doc_bi AS (
                SELECT doc_id, unnest(
                    CASE WHEN len(t) >= 2
                         THEN [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
                         ELSE [] END) AS bg
                FROM toks
            ),
            split_bi AS (
                SELECT doc_id, bg,
                       string_split(bg, ' ')[1] AS w1,
                       string_split(bg, ' ')[2] AS w2
                FROM doc_bi
            ),
            bi_counts AS (SELECT bg, count(*) AS c12 FROM doc_bi GROUP BY bg),
            uni_counts AS (SELECT w1, count(*) AS c1 FROM split_bi GROUP BY w1),
            v AS (SELECT count(DISTINCT w2) AS v FROM split_bi),
            scored AS (
                SELECT s.doc_id,
                       ln((b.c12 + 1.0) / (u.c1 + 1.0 * (SELECT v FROM v)))
                           AS logp
                FROM split_bi s
                JOIN bi_counts b ON b.bg = s.bg
                JOIN uni_counts u ON u.w1 = s.w1
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_bigrams, avg(logp) AS avg_logp
                FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   round(a.avg_logp, 9) AS avg_logp
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        """,
        # context windowing (|Δi| in 1..window), signed accumulation and
        # L2 norm replay in SQL; only the 25 (index, sign) blake2b hash
        # values are precomputed literals (DuckDB has no blake2b)
        "hash2vec": f"""
            WITH seq AS (
                SELECT n_regionkey AS walk,
                       CAST(n_nationkey AS VARCHAR) AS tok,
                       row_number() OVER (PARTITION BY n_regionkey
                                          ORDER BY n_nationkey) AS i
                FROM nation
            ),
            h(token, idx, sgn) AS (VALUES {_hash2vec_literal_rows()}),
            pairs AS (
                SELECT t.tok AS target, c.tok AS ctx
                FROM seq t JOIN seq c
                  ON t.walk = c.walk AND abs(t.i - c.i) BETWEEN 1 AND 2
            ),
            contrib AS (
                SELECT p.target, hh.idx, sum(hh.sgn) AS v
                FROM pairs p JOIN h hh ON hh.token = p.ctx
                GROUP BY p.target, hh.idx
            ),
            dense AS (
                SELECT s.tok AS id, CAST(r.range AS INTEGER) AS pos,
                       coalesce(c.v, 0.0) AS v
                FROM (SELECT DISTINCT tok FROM seq) s
                CROSS JOIN range(8) r
                LEFT JOIN contrib c ON c.target = s.tok AND c.idx = r.range
            ),
            norms AS (SELECT id, sqrt(sum(v * v)) AS nrm FROM dense GROUP BY id)
            SELECT d.id, d.pos,
                   round(CASE WHEN n.nrm > 0 THEN d.v / n.nrm ELSE d.v END,
                         9) AS val
            FROM dense d JOIN norms n USING (id)
        """,
        # the Bloom prefilter has no false negatives, so the streaming
        # operator's output equals the exact inverted-index semantics
        "dp_stream_contamination": f"""
            WITH sh AS ({_DOC_SHINGLES_SQL})
            SELECT a.doc_id AS doc_id, b.doc_id AS ref_doc_id,
                   CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_shared
            FROM sh a JOIN sh b
              ON b.doc_id % 7 = 0 AND a.doc_id <> b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) >= 2
        """,
        # one full SVD++ gradient iteration unrolled: md5 init (slots
        # 2,3 = column1; 4,5 = column2 at rank 2), phase-1 implicit fold
        # (users only), clamped-error gradients, per-vertex message sums
        "svdpp_full": f"""
            WITH e AS (
                SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst,
                       o_totalprice / 100000.0 AS w
                FROM orders
            ),
            mu AS (SELECT avg(w) AS u FROM e),
            ends AS (
                SELECT src AS id, w FROM e UNION ALL SELECT dst, w FROM e
            ),
            t0 AS (SELECT id, count(*) AS cnt, sum(w) AS s FROM ends GROUP BY id),
            init AS (
                SELECT id,
                       ('0x' || substr(md5(CAST(id AS VARCHAR) || '_2'), 1, 12))::BIGINT % 1000000 / 1000000.0 AS p0,
                       ('0x' || substr(md5(CAST(id AS VARCHAR) || '_3'), 1, 12))::BIGINT % 1000000 / 1000000.0 AS p1,
                       ('0x' || substr(md5(CAST(id AS VARCHAR) || '_4'), 1, 12))::BIGINT % 1000000 / 1000000.0 AS y0,
                       ('0x' || substr(md5(CAST(id AS VARCHAR) || '_5'), 1, 12))::BIGINT % 1000000 / 1000000.0 AS y1,
                       s / cnt - (SELECT u FROM mu) AS b,
                       1.0 / sqrt(cnt) AS nrm
                FROM t0
            ),
            t1 AS (
                SELECT e.src AS id, sum(i.y0) AS sy0, sum(i.y1) AS sy1
                FROM e JOIN init i ON i.id = e.dst GROUP BY e.src
            ),
            ph1 AS (
                SELECT i.id, i.p0, i.p1,
                       CASE WHEN t1.id IS NULL THEN i.y0
                            ELSE i.nrm * t1.sy0 + i.p0 END AS c20,
                       CASE WHEN t1.id IS NULL THEN i.y1
                            ELSE i.nrm * t1.sy1 + i.p1 END AS c21,
                       i.b, i.nrm
                FROM init i LEFT JOIN t1 ON t1.id = i.id
            ),
            trip AS (
                SELECT e.src, e.dst, e.w,
                       s.p0, s.p1, s.c20 AS u20, s.c21 AS u21,
                       s.b AS bu, s.nrm,
                       d.p0 AS q0, d.p1 AS q1, d.c20 AS y0, d.c21 AS y1,
                       d.b AS bi
                FROM e
                JOIN ph1 s ON s.id = e.src
                JOIN ph1 d ON d.id = e.dst
            ),
            gr AS (
                SELECT *,
                       w - least(greatest((SELECT u FROM mu) + bu + bi
                                          + q0 * u20 + q1 * u21, 0.0), 5.0)
                           AS er
                FROM trip
            ),
            msgs AS (
                SELECT src AS id,
                       (er * q0 - 0.015 * p0) * 0.007 AS m10,
                       (er * q1 - 0.015 * p1) * 0.007 AS m11,
                       (er * nrm * q0 - 0.015 * y0) * 0.007 AS m20,
                       (er * nrm * q1 - 0.015 * y1) * 0.007 AS m21,
                       (er - 0.005 * bu) * 0.007 AS m3
                FROM gr
                UNION ALL
                SELECT dst,
                       (er * u20 - 0.015 * q0) * 0.007,
                       (er * u21 - 0.015 * q1) * 0.007,
                       (er * nrm * q0 - 0.015 * y0) * 0.007,
                       (er * nrm * q1 - 0.015 * y1) * 0.007,
                       (er - 0.005 * bi) * 0.007
                FROM gr
            ),
            agg AS (
                SELECT id, sum(m10) AS a10, sum(m11) AS a11,
                       sum(m20) AS a20, sum(m21) AS a21, sum(m3) AS a3
                FROM msgs GROUP BY id
            )
            SELECT h.id,
                   round(h.p0 + coalesce(a.a10, 0), 7) AS f0,
                   round(h.p1 + coalesce(a.a11, 0), 7) AS f1,
                   round(h.c20 + coalesce(a.a20, 0), 7) AS i0,
                   round(h.c21 + coalesce(a.a21, 0), 7) AS i1,
                   round(h.b + coalesce(a.a3, 0), 7) AS bias,
                   round(h.nrm, 8) AS norm
            FROM ph1 h LEFT JOIN agg a ON a.id = h.id
        """,
        # one survivor per fingerprint group; winner identity only where
        # the group is a singleton (first-wins order is pytest-verified)
        "dp_stream_near_dup": f"""
            WITH sh AS ({_DOC_SHINGLES_SQL}),
            fp AS (
                SELECT doc_id,
                       list_min(list_transform(sh, s -> md5(s))) AS minfp
                FROM sh
            )
            SELECT minfp,
                   CAST(count(*) AS BIGINT) AS group_size,
                   CASE WHEN count(*) = 1 THEN min(doc_id) END AS unique_doc_id
            FROM fp GROUP BY minfp
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: motif two-hop traversal on
    the nation adjacency graph, aggregated per start nation."""
    sf_dir = "/root/testdata/sf0.001"
    g = _nation_graph(spark, sf_dir)
    m = g.find("(a)-[]->(b); (b)-[]->(c)").filter("a.id != c.id")
    return (
        m.select(
            F.col("a")["id"].alias("a_id"),
            F.col("c")["id"].alias("c_id"),
        )
        .groupBy("a_id")
        .agg(F.count("*").alias("n_two_hop"))
        .orderBy("a_id")
    )
