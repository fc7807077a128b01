"""Degenerate-input behavior across the algorithm library, mirroring the
reference suites' empty-graph / single-vertex cases (KCoreSuite.scala,
ConnectedComponentsSuite.scala:93-311): every algorithm must return an
empty (or single-row) result instead of crashing."""

import pytest

from graphframes_spark import GraphFrame


@pytest.fixture(scope="module")
def empty_graph(spark):
    v = spark.createDataFrame([], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    return GraphFrame(v, e)


@pytest.fixture(scope="module")
def single_vertex(spark):
    v = spark.createDataFrame([(1,)], ["id"])
    e = spark.createDataFrame([], "src long, dst long")
    return GraphFrame(v, e)


@pytest.mark.parametrize(
    "run",
    [
        lambda g: g.kCore(),
        lambda g: g.stronglyConnectedComponents(maxIter=5),
        lambda g: g.detectingCycles(),
        lambda g: g.maximalIndependentSet(),
        lambda g: g.triangleCount(),
        lambda g: g.powerIterationClustering(k=2),
        lambda g: g.labelPropagation(maxIter=2),
        lambda g: g.shortestPaths(landmarks=[1]),
        lambda g: g.pageRank(maxIter=2).vertices,
        lambda g: g.connectedComponents(),
        lambda g: g.louvain(),
        lambda g: g.katzCentrality(maxIter=2),
        lambda g: g.wlLabels(2),
    ],
    ids=[
        "kcore", "scc", "cycles", "mis", "triangle_count", "pic",
        "lpa", "shortest_paths", "pagerank", "cc",
        "louvain", "katz", "wl",
    ],
)
def test_empty_graph_returns_empty(empty_graph, run):
    assert run(empty_graph).count() == 0


def test_single_vertex_no_edges(single_vertex):
    assert single_vertex.kCore().collect()[0]["kcore"] == 0
    assert single_vertex.triangleCount().collect()[0]["count"] == 0
    cc = single_vertex.connectedComponents().collect()
    assert len(cc) == 1
    scc = single_vertex.stronglyConnectedComponents(maxIter=5).collect()
    assert len(scc) == 1 and scc[0]["component"] == 1
    assert single_vertex.detectingCycles().count() == 0
    mis = single_vertex.maximalIndependentSet().collect()
    assert [r["id"] for r in mis] == [1]
    louvain = single_vertex.louvain().collect()
    assert len(louvain) == 1 and louvain[0]["community"] == 1
    assert single_vertex.katzCentrality(maxIter=2).collect()[0]["katz"] == 0.0
    assert single_vertex.wlLabels(1).count() == 1
    # 1-row metric ops return NULL (no wedges / no edges), never crash
    assert single_vertex.transitivity().collect()[0]["transitivity"] is None
    assert single_vertex.reciprocity().collect()[0]["reciprocity"] is None
