"""Property-graph layer tests, mirroring the reference scenarios
(python/tests/pg/test_property_graphframe.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from graphframes_spark.propertygraph import (
    EdgePropertyGroup,
    InvalidPropertyGroupError,
    PropertyGraphFrame,
    VertexPropertyGroup,
)
from graphframes_spark.util import GraphFramesError


def masked(id_val, group):
    return group + hashlib.sha256(str(id_val).encode()).hexdigest()


@pytest.fixture(scope="module")
def people(spark):
    data = spark.createDataFrame(
        [(1, "Alice"), (2, "Bob"), (3, "Charlie"), (4, "David"), (5, "Eve")],
        ["id", "name"],
    )
    return VertexPropertyGroup("people", data, "id")


@pytest.fixture(scope="module")
def movies(spark):
    data = spark.createDataFrame(
        [(1, "Matrix"), (2, "Inception"), (3, "Interstellar")], ["id", "title"]
    )
    return VertexPropertyGroup("movies", data, "id")


@pytest.fixture(scope="module")
def likes(spark, people, movies):
    data = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 2), (4, 3), (5, 2)], ["src", "dst"]
    ).withColumn("weight", F.lit(1.0))
    return EdgePropertyGroup("likes", data, people, movies, True, "src", "dst", "weight")


@pytest.fixture(scope="module")
def pgraph(people, movies, likes):
    return PropertyGraphFrame([people, movies], [likes])


def test_vertex_group_validation(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(InvalidPropertyGroupError):
        VertexPropertyGroup("g", df, "id")


def test_edge_group_validation(spark, people, movies):
    df = spark.createDataFrame([(1, 1)], ["src", "dst"])
    with pytest.raises(InvalidPropertyGroupError):
        EdgePropertyGroup("g", df, people, movies, True, "src", "dst", "weight")
    bad_weight = df.withColumn("weight", F.lit("heavy"))
    with pytest.raises(InvalidPropertyGroupError):
        EdgePropertyGroup("g", bad_weight, people, movies, True, "src", "dst", "weight")


def test_to_graph_frame_masks_ids(pgraph):
    g = pgraph.to_graph_frame(["people", "movies"], ["likes"])
    ids = {r["id"] for r in g.vertices.collect()}
    assert masked(1, "people") in ids and masked(1, "movies") in ids
    assert len(ids) == 8
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert (masked(1, "people"), masked(1, "movies")) in edges
    groups = {r["property_group"] for r in g.vertices.collect()}
    assert groups == {"people", "movies"}


def test_to_graph_frame_with_filters(pgraph):
    g = pgraph.to_graph_frame(
        ["people", "movies"],
        ["likes"],
        vertex_group_filters={"people": F.col("id") <= 2},
        edge_group_filters={"likes": F.col("src") <= 2},
    )
    assert g.vertices.filter(F.col("property_group") == "people").count() == 2
    assert g.edges.count() == 3


def test_to_graph_frame_undirected_symmetrizes(spark, people, movies):
    data = spark.createDataFrame([(1, 2)], ["src", "dst"]).withColumn(
        "weight", F.lit(2.0)
    )
    eg = EdgePropertyGroup("u", data, people, people, False, "src", "dst", "weight")
    pg = PropertyGraphFrame([people], [eg])
    g = pg.to_graph_frame(["people"], ["u"])
    assert g.edges.count() == 2


def test_missing_group_raises(pgraph):
    with pytest.raises(GraphFramesError):
        pgraph.to_graph_frame(["nope"], ["likes"])


def test_projection_by(pgraph):
    projected = pgraph.projection_by("people", "movies", "likes")
    assert [g.name for g in projected.vertex_property_groups] == ["people"]
    eg = projected.edge_property_groups[-1]
    assert eg.name == "projected_likes" and not eg.is_directed
    pairs = {(r["src"], r["dst"]) for r in eg.data.collect()}
    # movie 1 liked by {1,2}; movie 2 by {1,3,5}; movie 3 by {4}
    assert pairs == {(1, 2), (1, 3), (1, 5), (3, 5)}


def test_projection_custom_weight(pgraph):
    projected = pgraph.projection_by(
        "people", "movies", "likes", new_edge_weight=lambda a, b: a + b
    )
    weights = {r["weight"] for r in projected.edge_property_groups[-1].data.collect()}
    assert weights == {2.0}


def test_projection_wrong_sides_raise(pgraph):
    with pytest.raises(GraphFramesError):
        pgraph.projection_by("movies", "people", "likes")


def test_join_vertices_roundtrip(pgraph):
    g = pgraph.to_graph_frame(["people", "movies"], ["likes"])
    cc = g.connectedComponents()
    back = pgraph.join_vertices(cc, ["people", "movies"])
    rows = back.collect()
    assert {r["external_id"] for r in rows} == {1, 2, 3, 4, 5}  # both groups' keys
    # people 1,2,3,5 share a component through movies 1,2; 4-3(movie) separate
    comp = {
        (r["property_group"], r["external_id"]): r["component"] for r in rows
    }
    main = {comp[("people", i)] for i in (1, 2, 3, 5)}
    assert len(main) == 1
    assert comp[("people", 4)] != comp[("people", 1)]


def test_unmasked_ids(spark):
    data = spark.createDataFrame([("u1", "x"), ("u2", "y")], ["id", "name"])
    vg = VertexPropertyGroup("users", data, "id", apply_mask_on_id=False)
    out = {r["id"] for r in vg.get_data().collect()}
    assert out == {"u1", "u2"}
