"""LDBC Graphalytics loader + validation helpers on a synthetic case
written in Graphalytics format (mirrors TestLDBCCases.scala shapes)."""

import os

import pytest

from graphframes_spark import ldbc
from graphframes_spark.util import GraphFramesError


@pytest.fixture()
def mini_case(tmp_path):
    """Two triangles {1,2,3} and {4,5,6}, undirected, plus expected
    BFS-from-1, WCC, and CDLP(maxIter=2) outputs."""
    name = "mini"
    root = tmp_path / name
    root.mkdir()
    (root / f"{name}.v").write_text("".join(f"{i}\n" for i in range(1, 7)))
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    (root / f"{name}.e").write_text("".join(f"{a} {b}\n" for a, b in edges))
    (root / f"{name}-BFS").write_text(
        f"1 0\n2 1\n3 1\n4 {ldbc.UNREACHABLE_ID}\n5 {ldbc.UNREACHABLE_ID}\n6 {ldbc.UNREACHABLE_ID}\n"
    )
    (root / f"{name}-WCC").write_text("1 1\n2 1\n3 1\n4 4\n5 4\n6 4\n")
    (root / f"{name}-CDLP").write_text("1 1\n2 1\n3 1\n4 4\n5 4\n6 4\n")
    (root / f"{name}.properties").write_text(
        f"graph.{name}.bfs.source-vertex = 1\n"
        f"graph.{name}.cdlp.max-iterations = 2\n"
    )
    return str(root), name


def test_read_graph_and_properties(spark, mini_case):
    root, name = mini_case
    g = ldbc.read_graph(spark, root, name, directed=False)
    assert g.vertices.count() == 6
    assert g.edges.count() == 12  # symmetrized
    props = ldbc.read_properties(root, name)
    assert props[f"graph.{name}.bfs.source-vertex"] == "1"
    assert int(props[f"graph.{name}.cdlp.max-iterations"]) == 2


def test_bfs_validation(spark, mini_case):
    root, name = mini_case
    g = ldbc.read_graph(spark, root, name, directed=False)
    expected = ldbc.read_expected(spark, root, name, "BFS")
    assert ldbc.bfs_mismatches(g, expected, source_vertex=1).count() == 0


def test_wcc_validation(spark, mini_case):
    root, name = mini_case
    g = ldbc.read_graph(spark, root, name, directed=False)
    expected = ldbc.read_expected(spark, root, name, "WCC")
    assert ldbc.wcc_mismatches(g, expected).count() == 0


def test_cdlp_validation(spark, mini_case):
    root, name = mini_case
    g = ldbc.read_graph(spark, root, name, directed=False)
    expected = ldbc.read_expected(spark, root, name, "CDLP")
    assert (
        ldbc.cdlp_mismatches(
            g, expected, max_iterations=2, graph_is_directed=False
        ).count()
        == 0
    )


def test_validation_catches_wrong_expected(spark, mini_case):
    root, name = mini_case
    g = ldbc.read_graph(spark, root, name, directed=False)
    wrong = spark.createDataFrame([(i, 99) for i in range(1, 7)], "id long, distance long")
    assert ldbc.bfs_mismatches(g, wrong, source_vertex=1).count() == 6


def test_unknown_case_and_missing_zstd(tmp_path, monkeypatch):
    with pytest.raises(GraphFramesError):
        ldbc.download_if_not_exists(str(tmp_path), "not-a-case")
    # present case dir short-circuits without network
    os.makedirs(tmp_path / ldbc.WIKI_TALKS, exist_ok=True)
    (tmp_path / ldbc.WIKI_TALKS / "wiki-Talk.v").write_text("1\n")
    assert ldbc.download_if_not_exists(str(tmp_path), ldbc.WIKI_TALKS).endswith(
        ldbc.WIKI_TALKS
    )


@pytest.fixture()
def weighted_case(tmp_path):
    """Directed weighted diamond 1->2->4, 1->3->4 with a cheap long way
    round, plus expected SSSP-from-1 (unreachable 5 = infinity)."""
    name = "wmini"
    root = tmp_path / name
    root.mkdir()
    (root / f"{name}.v").write_text("".join(f"{i}\n" for i in range(1, 6)))
    edges = [(1, 2, 10.0), (1, 3, 1.0), (3, 4, 1.0), (2, 4, 0.5), (3, 2, 2.0)]
    (root / f"{name}.e").write_text("".join(f"{a} {b} {w}\n" for a, b, w in edges))
    # 1->3 = 1, 1->2 = min(10, 1+2) = 3, 1->4 = min(1+1, 3+0.5) = 2
    (root / f"{name}-SSSP").write_text("1 0.0\n2 3.0\n3 1.0\n4 2.0\n5 infinity\n")
    (root / f"{name}.properties").write_text(
        f"graph.{name}.sssp.source-vertex = 1\n"
    )
    return str(root), name


def test_sssp_validation(spark, weighted_case):
    root, name = weighted_case
    g = ldbc.read_graph(spark, root, name, directed=True, weighted=True)
    expected = ldbc.read_expected(spark, root, name, "SSSP")
    src = int(ldbc.read_properties(root, name)[f"graph.{name}.sssp.source-vertex"])
    assert ldbc.sssp_mismatches(g, expected, src).count() == 0
    # the unreachable sentinel is genuinely VALIDATED, not dropped: the
    # "infinity" literal must parse to +inf (not NULL)
    assert (
        expected.filter("id = 5").collect()[0]["distance"] == float("inf")
    )
    # a wrong expected row is caught
    bad = expected.limit(0).union(
        spark.createDataFrame([(4, 99.0)], "id long, distance double")
    )
    assert ldbc.sssp_mismatches(g, bad, src).count() == 1
    # a wrong FINITE claim about an unreachable vertex is caught too
    bad_unreachable = expected.filter("id != 5").union(
        spark.createDataFrame([(5, 99.0)], "id long, distance double")
    )
    assert ldbc.sssp_mismatches(g, bad_unreachable, src).count() == 1
