import gc

import pytest
from pyspark.sql import SparkSession

from graphframes_spark import GraphFrame


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graphframes_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        # localCheckpoint blocks from iterative algorithms are only
        # dropped after a JVM GC lets ContextCleaner see the dead RDDs;
        # the default periodic-GC interval (30min) is longer than the
        # suite, so a long run can exhaust unified memory (observed:
        # UNABLE_TO_ACQUIRE_MEMORY ~33min in). Collect every minute.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # the SQL status store retains the last 1000 executions EVEN
        # WITH THE UI DISABLED; fused iterative plans carry thousands
        # of metrics each, so ~450 tests retained ~2.6GB of live
        # SQLPlanMetric arrays (measured via GC.class_histogram) and
        # starved the 4g heap. Keep a handful for debugging, not 1000.
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _release_py4j_refs(request):
    """Drop dead py4j DataFrame refs promptly after iteration-heavy tests
    so ContextCleaner (see periodicGC above) can actually free their
    localCheckpoint blocks — CPython's allocator rarely runs gen-2 GC on
    its own here because the Python-side objects are tiny."""
    yield
    if request.node.get_closest_marker("slow") is not None:
        gc.collect()


@pytest.fixture(scope="session")
def friends(spark):
    """Canonical small attributed graph (FIXTURES.md §1; reference
    examples/Graphs.scala:63-93)."""
    v = spark.createDataFrame(
        [
            ("a", "Alice", 34),
            ("b", "Bob", 36),
            ("c", "Charlie", 30),
            ("d", "David", 29),
            ("e", "Esther", 32),
            ("f", "Fanny", 36),
            ("g", "Gabby", 60),
        ],
        ["id", "name", "age"],
    )
    e = spark.createDataFrame(
        [
            ("a", "b", "friend"),
            ("b", "c", "follow"),
            ("c", "b", "follow"),
            ("f", "c", "follow"),
            ("e", "f", "follow"),
            ("e", "d", "friend"),
            ("d", "a", "friend"),
            ("a", "e", "friend"),
        ],
        ["src", "dst", "relationship"],
    )
    return GraphFrame(v, e)


def chain_graph(spark, n):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    return GraphFrame(v, e)


def star_graph(spark, n):
    v = spark.createDataFrame([(i,) for i in range(n + 1)], ["id"])
    e = spark.createDataFrame([(0, i) for i in range(1, n + 1)], ["src", "dst"])
    return GraphFrame(v, e)


def two_blobs(spark, n):
    """Two complete digraphs {0..n-1}, {n..2n-1} plus bridge edge (0, n)."""
    v = spark.createDataFrame([(i,) for i in range(2 * n)], ["id"])
    edges = [
        (i + off, j + off)
        for off in (0, n)
        for i in range(n)
        for j in range(n)
        if i != j
    ] + [(0, n)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    return GraphFrame(v, e)
