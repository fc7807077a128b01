"""graphframes_spark — a PySpark-native graph analytics engine.

A from-scratch, pure-Python re-expression of the capabilities of
graphframes/graphframes (reference surveyed in SURVEY.md) on the public
PySpark DataFrame API. A graph is a pair of DataFrames (vertices with an
``id`` column, edges with ``src``/``dst``); every operator compiles to
declarative DataFrame algebra so Catalyst/AQE pick the physical plan.

No JVM-side code, no RDDs: works identically on Spark classic and
Spark Connect, and scales with ordinary Spark partitioning semantics.
"""

from graphframes_spark.graphframe import GraphFrame
from graphframes_spark.lib.aggregate_neighbors import dst_attr, edge_attr, src_attr
from graphframes_spark.pregel import Pregel
from graphframes_spark.propertygraph import (
    EdgePropertyGroup,
    PropertyGraphFrame,
    VertexPropertyGroup,
)
from graphframes_spark.rw import RandomWalkWithRestart

__version__ = "0.2.0"

__all__ = [
    "EdgePropertyGroup",
    "GraphFrame",
    "Pregel",
    "PropertyGraphFrame",
    "RandomWalkWithRestart",
    "VertexPropertyGroup",
    "__version__",
    "dst_attr",
    "edge_attr",
    "src_attr",
]
