import pytest
from pyspark.sql import functions as F

from graphframes_spark import GraphFrame
from graphframes_spark.util import GraphFramesError


def test_construction_validates_columns(spark):
    v = spark.createDataFrame([(1,)], ["id"])
    e = spark.createDataFrame([(1, 1)], ["src", "dst"])
    GraphFrame(v, e)
    with pytest.raises(GraphFramesError):
        GraphFrame(v.withColumnRenamed("id", "vid"), e)
    with pytest.raises(GraphFramesError):
        GraphFrame(v, e.withColumnRenamed("src", "s"))


def test_from_edges(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    g = GraphFrame.fromEdges(e)
    assert sorted(r["id"] for r in g.vertices.collect()) == [1, 2, 3]


def test_degrees(friends):
    out = {r["id"]: r["outDegree"] for r in friends.outDegrees.collect()}
    assert out == {"a": 2, "b": 1, "c": 1, "d": 1, "e": 2, "f": 1}
    ind = {r["id"]: r["inDegree"] for r in friends.inDegrees.collect()}
    assert ind == {"a": 1, "b": 2, "c": 2, "d": 1, "e": 1, "f": 1}
    deg = {r["id"]: r["degree"] for r in friends.degrees.collect()}
    assert deg == {"a": 3, "b": 3, "c": 3, "d": 2, "e": 3, "f": 2}
    # isolated vertex g absent from all degree outputs
    assert "g" not in deg


def test_triplets(friends):
    t = friends.triplets
    assert set(t.columns) == {"src", "edge", "dst"}
    rows = t.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["edge"]["src"] == r["src"]["id"]
        assert r["edge"]["dst"] == r["dst"]["id"]


def test_type_degrees(friends):
    td = {r["id"]: r["outDegrees"] for r in friends.typeOutDegree("relationship").collect()}
    assert td["a"]["friend"] == 2 and td["a"]["follow"] == 0
    assert td["b"]["follow"] == 1
    full = {r["id"]: r["degrees"] for r in friends.typeDegree("relationship").collect()}
    assert full["c"]["follow"] == 3
    assert full["e"]["friend"] == 2 and full["e"]["follow"] == 1


def test_filter_vertices(friends):
    g2 = friends.filterVertices("age > 30")
    ids = {r["id"] for r in g2.vertices.collect()}
    assert ids == {"a", "b", "e", "f", "g"}
    edges = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert edges == {("a", "b"), ("e", "f"), ("a", "e")}


def test_filter_edges(friends):
    g2 = friends.filterEdges("relationship = 'friend'")
    assert g2.edges.count() == 4
    assert g2.vertices.count() == 7


def test_drop_isolated_vertices(friends):
    g2 = friends.dropIsolatedVertices()
    assert {r["id"] for r in g2.vertices.collect()} == {"a", "b", "c", "d", "e", "f"}


def test_as_undirected_and_reversed(friends):
    und = friends.asUndirected()
    assert und.edges.count() == 16
    rev = friends.asReversed()
    pairs = {(r["src"], r["dst"]) for r in rev.edges.collect()}
    assert ("b", "a") in pairs and ("a", "b") not in pairs


def test_validate(spark, friends):
    friends.validate()
    v = spark.createDataFrame([(1,), (1,)], ["id"])
    e = spark.createDataFrame([(1, 1)], ["src", "dst"])
    with pytest.raises(GraphFramesError):
        GraphFrame(v, e).validate()
    v2 = spark.createDataFrame([(1,)], ["id"])
    e2 = spark.createDataFrame([(1, 99)], ["src", "dst"])
    with pytest.raises(GraphFramesError):
        GraphFrame(v2, e2).validate()


def test_examples_module(spark):
    from graphframes_spark import examples

    g = examples.friends(spark)
    assert g.vertices.count() == 7 and g.edges.count() == 8
    assert examples.chain(spark, 5).edges.count() == 4
    assert examples.star(spark, 4).outDegrees.filter("id = 0").first()["outDegree"] == 4
    tb = examples.two_blobs(spark, 3)
    # reference semantics: all v1/v2 pairs per blob INCLUDING self-loops
    # (Graphs.scala:102-104 ranges over the full cross product) + bridge
    assert tb.edges.count() == 2 * 3 * 3 + 1
    assert {"v_attr1", "v_attr2"} <= set(tb.vertices.columns)
    assert "e_attr1" in tb.edges.columns
    emp = examples.empty(spark, "string")
    assert emp.vertices.count() == 0 and emp.edges.count() == 0
    als = examples.als_synthetic_data(spark)
    assert als.edges.count() == 16 and als.vertices.count() == 8
    # bipartite id scheme: users even, items odd
    assert als.edges.filter("src % 2 != 0 OR dst % 2 != 1").count() == 0
    ising = examples.grid_ising_model(spark, 3)
    assert ising.vertices.count() == 9
    assert ising.edges.count() == 12
    assert {"a", "id", "i", "j"} <= set(ising.vertices.columns)
    assert "b" in ising.edges.columns


def test_sample_vertices_deterministic_and_induced(friends):
    g1 = friends.sampleVertices(0.6, seed="t")
    g2 = friends.sampleVertices(0.6, seed="t")
    ids1 = {r["id"] for r in g1.vertices.collect()}
    assert ids1 == {r["id"] for r in g2.vertices.collect()}
    # induced: every surviving edge has both endpoints in the sample
    for r in g1.edges.collect():
        assert r["src"] in ids1 and r["dst"] in ids1
    # fraction bounds
    assert friends.sampleVertices(1.0).vertices.count() == friends.vertices.count()
    assert friends.sampleVertices(0.0).vertices.count() == 0


def test_sample_edges_keeps_vertices(friends):
    g = friends.sampleEdges(0.5, seed="t")
    assert g.vertices.count() == friends.vertices.count()
    assert g.edges.count() <= friends.edges.count()
    again = friends.sampleEdges(0.5, seed="t")
    assert sorted(map(tuple, g.edges.collect())) == sorted(map(tuple, again.edges.collect()))


def test_save_load_roundtrip(spark, friends, tmp_path):
    path = str(tmp_path / "g")
    friends.save(path)
    g2 = type(friends).load(spark, path)
    assert sorted(r["id"] for r in g2.vertices.collect()) == sorted(
        r["id"] for r in friends.vertices.collect()
    )
    assert g2.edges.count() == friends.edges.count()
    assert set(g2.vertices.columns) == set(friends.vertices.columns)
    # overwrite mode replaces; error mode raises on existing path
    friends.save(path, mode="overwrite")
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        friends.save(path, mode="error")


def test_save_partitioned_edges(spark, tmp_path):
    from graphframes_spark import GraphFrame

    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, "a"), (1, 2, "a"), (2, 3, "b")], ["src", "dst", "etype"]
    )
    path = str(tmp_path / "pg")
    GraphFrame(v, e).save(path, partitionEdgesBy=["etype"])
    import os

    assert os.path.isdir(os.path.join(path, "edges", "etype=a"))
    g2 = GraphFrame.load(spark, path)
    assert g2.edges.filter("etype = 'b'").count() == 1


def test_save_as_table_bucketed_elides_exchange(spark, tmp_path):
    import uuid

    from graphframes_spark import GraphFrame

    db = f"gfs_bt_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/wh'")
    spark.catalog.setCurrentDatabase(db)
    try:
        v = spark.range(100).select(F.col("id"))
        e = spark.range(300).select(
            (F.col("id") % 100).alias("src"), ((F.col("id") * 7) % 100).alias("dst")
        )
        GraphFrame(v, e).saveAsTable("g", numBuckets=4)
        g2 = GraphFrame.loadTable(spark, "g")
        assert g2.vertices.count() == 100 and g2.edges.count() == 300

        # the shuffle-free payoff: a per-src aggregation over the
        # bucketed edge table plans with NO exchange on src
        agg = g2.edges.groupBy("src").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(src" not in plan, plan
        # sanity: the same aggregation over the raw (unbucketed) edges
        # DOES need the exchange — the assertion above is meaningful
        raw_plan = (
            e.groupBy("src").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning(src" in raw_plan
        # degrees run end-to-end off the catalog tables
        assert g2.outDegrees.count() == 100
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_save_as_table_validation(spark, friends):
    from graphframes_spark.util import GraphFramesError

    with pytest.raises(GraphFramesError):
        friends.saveAsTable("nope", numBuckets=0)


def test_from_edge_list(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text(
        "# Directed graph: toy\n"
        "# FromNodeId\tToNodeId\n"
        "0\t1\n"
        "1 2\n"
        "\n"
        "2\t0\n"
    )
    g = GraphFrame.fromEdgeList(spark, str(p))
    assert sorted(r["id"] for r in g.vertices.collect()) == [0, 1, 2]
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 2), (2, 0)}
    assert g.connectedComponents().select("component").distinct().count() == 1
    g2 = GraphFrame.from_edge_list(spark, str(p), integral_ids=False)
    assert dict(g2.edges.dtypes)["src"] == "string"
