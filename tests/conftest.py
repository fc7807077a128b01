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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


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
