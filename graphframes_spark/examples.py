"""Canonical example graphs, mirroring the reference's public fixtures
(/root/reference/core/src/main/scala/org/graphframes/examples/Graphs.scala:38-242).
"""

from __future__ import annotations

import math
from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphframes_spark.graphframe import GraphFrame


def friends(spark: SparkSession) -> GraphFrame:
    """Seven-person social graph with typed edges (Graphs.scala:63-93)."""
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


def chain(spark: SparkSession, n: int) -> GraphFrame:
    """Directed path 0 -> 1 -> ... -> n-1 (Graphs.scala:50-59)."""
    v = spark.range(n).select(F.col("id"))
    e = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return GraphFrame(v, e)


def star(spark: SparkSession, n: int) -> GraphFrame:
    """Center 0 with n out-edges to leaves 1..n (Graphs.scala:120-128)."""
    v = spark.range(n + 1).select(F.col("id"))
    e = spark.range(1, n + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    return GraphFrame(v, e)


def empty(spark: SparkSession, id_type: str = "long") -> GraphFrame:
    """Empty GraphFrame of the given id type (Graphs.scala:38-45)."""
    v = spark.createDataFrame([], f"id {id_type}")
    e = spark.createDataFrame([], f"src {id_type}, dst {id_type}")
    return GraphFrame(v, e)


def two_blobs(spark: SparkSession, n: int) -> GraphFrame:
    """Two complete digraphs of n vertices (self-loops included, per the
    reference's comprehension over all v1/v2 pairs) plus a bridge edge
    (0, n); vertex attrs ``v_attr1``/``v_attr2`` and edge attr
    ``e_attr1`` match Graphs.scala:100-113."""
    v = spark.range(2 * n).select(
        F.col("id"),
        F.col("id").cast("string").alias("v_attr1"),
        F.col("id").cast("int").alias("v_attr2"),
    )
    blob = (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(n).select(F.col("id").alias("dst")))
    )
    e = (
        blob.unionByName(
            blob.select((F.col("src") + n).alias("src"), (F.col("dst") + n).alias("dst"))
        )
        .unionByName(
            spark.createDataFrame([(0, n)], "src long, dst long")
        )
        .withColumn("e_attr1", F.concat_ws("-", "src", "dst"))
    )
    return GraphFrame(v, e)


def als_synthetic_data(spark: SparkSession) -> GraphFrame:
    """The reference's 16-rating bipartite ALS fixture: users get even
    ids (2u), items odd (2i+1), edge ``weight`` is the rating
    (Graphs.scala:133-169) — the SVD++ example input."""
    raw = [
        (1, 1, 5.0), (1, 2, 1.0), (1, 3, 5.0), (1, 4, 1.0),
        (2, 1, 5.0), (2, 2, 1.0), (2, 3, 5.0), (2, 4, 1.0),
        (3, 1, 1.0), (3, 2, 5.0), (3, 3, 1.0), (3, 4, 5.0),
        (4, 1, 1.0), (4, 2, 5.0), (4, 3, 1.0), (4, 4, 5.0),
    ]
    e = spark.createDataFrame(
        [(u * 2, i * 2 + 1, r) for u, i, r in raw], ["src", "dst", "weight"]
    )
    v = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    return GraphFrame(v, e)


def grid_ising_model(
    spark: SparkSession, n: int, v_std: float = 1.0, e_std: float = 1.0, seed: int = 42
) -> GraphFrame:
    """n x n grid with gaussian vertex potentials ``a`` and edge couplings
    ``b`` — the belief-propagation example input (Graphs.scala:196-242).
    Vertex ids are "i,j" strings; edges connect right/down neighbors.
    """
    cells = (
        spark.range(n)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(n).select(F.col("id").alias("j")))
    )
    v = cells.select(
        F.concat_ws(",", "i", "j").alias("id"),
        (F.randn(seed) * v_std).alias("a"),
        F.col("i"),
        F.col("j"),
    )
    right = cells.filter(F.col("j") < n - 1).select(
        F.concat_ws(",", "i", "j").alias("src"),
        F.concat_ws(",", F.col("i"), F.col("j") + 1).alias("dst"),
    )
    down = cells.filter(F.col("i") < n - 1).select(
        F.concat_ws(",", "i", "j").alias("src"),
        F.concat_ws(",", F.col("i") + 1, F.col("j")).alias("dst"),
    )
    e = right.unionByName(down).withColumn("b", F.randn(seed + 1) * e_std)
    return GraphFrame(v, e)
