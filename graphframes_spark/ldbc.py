"""LDBC Graphalytics dataset loader and validation helpers.

Mirrors the reference's LDBC utilities
(/root/reference/core/src/main/scala/org/graphframes/examples/LDBCUtils.scala:7-90,
validation shapes: core/src/test/scala/org/graphframes/ldbc/TestLDBCCases.scala:26-200):
Graphalytics cases are a directory with ``<name>.v`` (one vertex id per
line), ``<name>.e`` (``src dst [weight]``, space-delimited), a java
``<name>.properties`` file carrying per-algorithm parameters, and
space-delimited expected-output files ``<name>-BFS`` / ``-CDLP`` /
``-PR`` / ``-WCC`` / ``-SSSP``.

Download is attempted only when the case directory is missing: the
datasets live at ``https://datasets.ldbcouncil.org/graphalytics/`` as
``.tar.zst`` archives, so an external ``zstd`` binary and network access
are required — environments without either get a clear error instead of
a stack trace, and all read/validate helpers work on pre-fetched data.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphframes_spark.graphframe import GraphFrame
from graphframes_spark.util import GraphFramesError

LDBC_URL_PREFIX = "https://datasets.ldbcouncil.org/graphalytics/"

TEST_BFS_DIRECTED = "test-bfs-directed"
TEST_BFS_UNDIRECTED = "test-bfs-undirected"
TEST_CDLP_DIRECTED = "test-cdlp-directed"
TEST_CDLP_UNDIRECTED = "test-cdlp-undirected"
TEST_PR_DIRECTED = "test-pr-directed"
TEST_PR_UNDIRECTED = "test-pr-undirected"
TEST_WCC_DIRECTED = "test-wcc-directed"
TEST_WCC_UNDIRECTED = "test-wcc-undirected"
KGS = "kgs"
CIT_PATENTS = "cit-Patents"
WIKI_TALKS = "wiki-Talk"
GRAPH500_CASES = tuple(f"graph500-{i}" for i in range(22, 31))

CASE_NAMES = frozenset(
    {
        TEST_BFS_DIRECTED,
        TEST_BFS_UNDIRECTED,
        TEST_CDLP_DIRECTED,
        TEST_CDLP_UNDIRECTED,
        TEST_PR_DIRECTED,
        TEST_PR_UNDIRECTED,
        TEST_WCC_DIRECTED,
        TEST_WCC_UNDIRECTED,
        KGS,
        CIT_PATENTS,
        WIKI_TALKS,
        *GRAPH500_CASES,
    }
)

#: sentinel distance for unreachable vertices in BFS validation
#: (TestLDBCCases.scala:25)
UNREACHABLE_ID = (1 << 63) - 1

_EXPECTED_SCHEMAS = {
    "BFS": "id long, distance long",
    "CDLP": "id long, community long",
    "PR": "id long, rank double",
    "WCC": "id long, component long",
    "SSSP": "id long, distance double",
}


def download_if_not_exists(resources_path: str, case_name: str) -> str:
    """Ensure ``<resources_path>/<case_name>/`` exists, downloading and
    unpacking the Graphalytics ``.tar.zst`` archive when missing.
    Returns the case directory. Raises ``GraphFramesError`` with a
    remediation hint when network or ``zstd`` are unavailable
    (LDBCUtils.scala:54-90)."""
    if case_name not in CASE_NAMES:
        raise GraphFramesError(
            f"unknown LDBC case {case_name!r}; known: {', '.join(sorted(CASE_NAMES))}"
        )
    case_root = os.path.join(resources_path, case_name)
    if os.path.isdir(case_root) and os.listdir(case_root):
        return case_root
    if shutil.which("zstd") is None:
        raise GraphFramesError(
            "zstd binary not found; install zstd or pre-extract "
            f"{LDBC_URL_PREFIX}{case_name}.tar.zst into {case_root}"
        )
    os.makedirs(resources_path, exist_ok=True)
    archive = os.path.join(resources_path, f"{case_name}.tar.zst")
    url = f"{LDBC_URL_PREFIX}{case_name}.tar.zst"
    try:
        import urllib.request

        urllib.request.urlretrieve(url, archive)
    except Exception as exc:  # noqa: BLE001
        raise GraphFramesError(
            f"could not download {url} ({exc}); pre-fetch it manually and "
            f"extract into {case_root}"
        ) from exc
    subprocess.run(
        ["tar", "--use-compress-program=zstd -d", "-xf", archive, "-C", resources_path],
        check=True,
    )
    os.remove(archive)
    return case_root


def read_graph(
    spark: SparkSession,
    case_root: str,
    case_name: str,
    directed: bool = True,
    weighted: bool = False,
) -> GraphFrame:
    """GraphFrame from ``<case_root>/<case_name>.v`` / ``.e``
    (TestLDBCCases.scala:26-62). Undirected cases are symmetrized at load
    (each edge emitted both ways), matching the reference reader."""
    prefix = os.path.join(case_root, case_name)
    e_schema = "src long, dst long" + (", weight double" if weighted else "")
    edges = (
        spark.read.option("delimiter", " ")
        .option("header", "false")
        .schema(e_schema)
        .csv(f"{prefix}.e")
    )
    if not directed:
        back = edges.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            *([F.col("weight")] if weighted else []),
        )
        edges = edges.union(back)
    vertices = (
        spark.read.text(f"{prefix}.v")
        .select(F.split(F.col("value"), " ").getItem(0).cast("long").alias("id"))
    )
    return GraphFrame(vertices, edges)


def read_expected(
    spark: SparkSession, case_root: str, case_name: str, algorithm: str
) -> DataFrame:
    """Expected-output DataFrame for ``algorithm`` in
    {BFS, CDLP, PR, WCC, SSSP} (space-delimited ``<case>-<ALGO>`` file)."""
    algorithm = algorithm.upper()
    if algorithm not in _EXPECTED_SCHEMAS:
        raise GraphFramesError(
            f"unknown expected-output kind {algorithm!r}; "
            f"known: {', '.join(sorted(_EXPECTED_SCHEMAS))}"
        )
    path = os.path.join(case_root, f"{case_name}-{algorithm}")
    if algorithm == "SSSP":
        # Graphalytics encodes unreachable SSSP distances as the literal
        # lowercase "infinity", which Spark's CSV double parser turns
        # into NULL (it accepts only "Inf"/"Infinity"); a NULL expected
        # value would make the mismatch filter silently DROP that row
        # instead of validating it, so parse as string and map the
        # sentinel explicitly.
        raw = (
            spark.read.option("delimiter", " ")
            .option("header", "false")
            .schema("id long, distance string")
            .csv(path)
        )
        return raw.select(
            "id",
            F.when(
                F.lower(F.col("distance")).isin("infinity", "inf", "+infinity"),
                F.lit(float("inf")),
            )
            .otherwise(F.col("distance").cast("double"))
            .alias("distance"),
        )
    return (
        spark.read.option("delimiter", " ")
        .option("header", "false")
        .schema(_EXPECTED_SCHEMAS[algorithm])
        .csv(path)
    )


def read_properties(case_root: str, case_name: str) -> Dict[str, str]:
    """Parse the java-style ``<case>.properties`` file into a dict."""
    props: Dict[str, str] = {}
    path = os.path.join(case_root, f"{case_name}.properties")
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                key, _, value = line.partition("=")
                props[key.strip()] = value.strip()
    return props


def bfs_mismatches(
    graph: GraphFrame,
    expected: DataFrame,
    source_vertex: int,
    is_directed: bool = True,
) -> DataFrame:
    """Rows where shortestPaths-from-source disagrees with the expected
    BFS distances; empty ⟺ validated (TestLDBCCases.scala:90-117).
    Unreachable vertices compare as ``UNREACHABLE_ID``.

    Graphalytics BFS distances run source → vertex; ``shortestPaths``
    measures vertex → landmark along edge direction, so directed cases
    validate on the reversed graph (same convention as
    ``sssp_mismatches``; identical for undirected cases)."""
    if is_directed:
        graph = graph.asReversed()
    got = (
        graph.shortestPaths([source_vertex], isDirected=is_directed)
        .select(
            F.col("id"),
            F.coalesce(
                F.element_at(F.col("distances"), F.lit(source_vertex)).cast("long"),
                F.lit(UNREACHABLE_ID),
            ).alias("got_distance"),
        )
    )
    return got.join(expected, on="id", how="left").filter(
        F.col("got_distance") != F.col("distance")
    )


def sssp_mismatches(
    graph: GraphFrame,
    expected: DataFrame,
    source_vertex: int,
    is_directed: bool = True,
) -> DataFrame:
    """Rows where weighted shortest paths disagree (beyond 1e-6) with the
    expected SSSP distances; empty ⟺ validated. Graphalytics encodes
    unreachable vertices as +infinity, which ``read_expected`` parses to
    ``inf`` — compare with the same sentinel.

    Graphalytics distances run source → vertex; ``shortestPathsWeighted``
    measures vertex → landmark along edge direction, so validate on the
    reversed graph (identical for undirected cases)."""
    if is_directed:
        graph = graph.asReversed()
    got = graph.shortestPathsWeighted(
        [source_vertex], weightCol="weight", isDirected=is_directed
    ).select(
        F.col("id"),
        F.coalesce(
            F.element_at(F.col("distances"), F.lit(source_vertex)),
            F.lit(float("inf")),
        ).alias("got_distance"),
    )
    return got.join(expected, on="id", how="left").filter(
        ~(
            (F.col("got_distance") == F.col("distance"))
            | (F.abs(F.col("got_distance") - F.col("distance")) < 1e-6)
        )
    )


def cdlp_mismatches(
    graph: GraphFrame,
    expected: DataFrame,
    max_iterations: int,
    graph_is_directed: bool = True,
) -> DataFrame:
    """Rows where labelPropagation disagrees with the expected CDLP
    communities; empty ⟺ validated (TestLDBCCases.scala:139-151).

    ``graph_is_directed`` describes the GRAPH (the Graphalytics case) —
    deliberately renamed from the earlier ``is_directed``, whose meaning
    was the propagation mode, so stale call sites fail loudly instead of
    silently flipping semantics. The inversion happens internally:
    Graphalytics CDLP on a DIRECTED graph counts each edge's label in
    both directions (in- and out-neighbors, with multiplicity), which is
    exactly ``labelPropagation(isDirected=False)`` over the raw directed
    edge list; the undirected cases arrive pre-symmetrized from
    ``read_graph`` so incoming-only propagation
    (``labelPropagation(isDirected=True)``) sees every neighbor exactly
    once, matching the reference test's setup."""
    got = graph.labelPropagation(
        maxIter=max_iterations, isDirected=not graph_is_directed
    ).select("id", "label")
    return got.join(expected, on="id", how="left").filter(
        F.col("label") != F.col("community")
    )


def wcc_mismatches(graph: GraphFrame, expected: DataFrame) -> DataFrame:
    """Pairs of vertices the expected WCC puts together but
    connectedComponents separates (or vice versa): compares the component
    PARTITION, not raw labels — both sides normalize each component to
    its min member id."""
    got = graph.connectedComponents().select("id", "component")
    got_norm = got.join(
        got.groupBy("component").agg(F.min("id").alias("_rep")), on="component"
    ).select("id", F.col("_rep").alias("got_rep"))
    exp_norm = expected.join(
        expected.groupBy("component").agg(F.min("id").alias("_rep")), on="component"
    ).select("id", F.col("_rep").alias("exp_rep"))
    return got_norm.join(exp_norm, on="id", how="full").filter(
        F.col("got_rep") != F.col("exp_rep")
    )


def pr_max_abs_error(
    graph: GraphFrame, expected: DataFrame, reset_probability: float, max_iter: int
) -> float:
    """Max |rank - expected| after sum-normalizing this engine's ranks,
    exactly as the reference's conformance test does before comparing
    against the Graphalytics golden file (TestLDBCCases.scala:175-195:
    ``pagerank / sum(pagerank)`` vs expected, tolerance 1e-4). Official
    expected vectors sum to 1; ours do too when the graph has no
    dangling vertices, so the normalization is a no-op there and
    otherwise absorbs the undistributed dangling mass."""
    got = graph.pageRank(
        resetProbability=reset_probability, maxIter=max_iter
    ).vertices.select("id", "pagerank")
    total = got.agg(F.sum("pagerank").alias("s")).collect()[0]["s"]
    got = got.select(
        F.col("id"), (F.col("pagerank") / F.lit(float(total))).alias("got")
    )
    row = (
        got.join(expected, on="id")
        .select(F.max(F.abs(F.col("got") - F.col("rank"))).alias("err"))
        .collect()[0]
    )
    return float(row["err"]) if row["err"] is not None else 0.0
