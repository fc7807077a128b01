"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator from SURVEY.md §2 on graph
views derived from the driver's TPC-H-ish testdata (TESTDATA.md), and the
matching ``oracle_sql()`` entry reproduces the exact semantics in DuckDB
SQL. Column names and types are aligned on both sides so the driver's
row-count + schema + value-hash comparison passes.

Graph views used (FIXTURES.md §6):
- customer–order bipartite: v = custkeys ∪ (orderkeys + 10^7),
  e = (custkey → orderkey + 10^7)
- nation adjacency: nations fully connected within a region (directed
  both ways, no self-loops)
- events chain: consecutive events per user ordered by (ts, event_id)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphframes_spark import GraphFrame

ORDER_OFFSET = 10_000_000


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


# ------------------------------------------------------------------- queries


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


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _events_chain_graph(spark, sf_dir)
    events = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select("event_id", "user_id", F.row_number().over(w).alias("rn"))
    min_user = events.agg(F.min("user_id")).collect()[0][0]
    user_seq = seq.filter(F.col("user_id") == min_user)
    # landmark 21 hops into the chain bounds Pregel supersteps at any SF
    max_rn = user_seq.agg(F.max("rn")).collect()[0][0]
    lrn = min(21, max_rn)
    landmark = user_seq.filter(F.col("rn") == lrn).collect()[0]["event_id"]
    sp = g.shortestPaths(landmarks=[landmark])
    return sp.select(
        F.col("id"), F.explode(F.col("distances")).alias("landmark", "distance")
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "out_degrees": q_out_degrees,
        "in_degrees": q_in_degrees,
        "degrees": q_degrees,
        "triplets": q_triplets,
        "motif_two_hop": q_motif_two_hop,
        "motif_mutual": q_motif_mutual,
        "motif_negation": q_motif_negation,
        "motif_var_length": q_motif_var_length,
        "filter_vertices": q_filter_vertices,
        "type_out_degree": q_type_out_degree,
        "triangle_count": q_triangle_count,
        "connected_components": q_connected_components,
        "shortest_paths": q_shortest_paths,
        "label_propagation": q_label_propagation,
        "pagerank": q_pagerank,
        "aggregate_messages": q_aggregate_messages,
        "bfs": q_bfs,
    }


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
