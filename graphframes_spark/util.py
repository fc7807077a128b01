"""Shared helpers: column quoting, struct nesting, conf access.

Mirrors the helper semantics of the reference implementation
(/root/reference/core/src/main/scala/org/graphframes/GraphFrame.scala:1325-1370)
re-expressed for PySpark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reserved column names (GraphFrame.scala:1135-1166).
ID = "id"
SRC = "src"
DST = "dst"
EDGE = "edge"
ATTR = "attr"
WEIGHT = "weight"
LONG_ID = "new_id"
LONG_SRC = "new_src"
LONG_DST = "new_dst"
ORIG_ID = "_orig_id"


def quote(name: str) -> str:
    """Backtick-quote a column name so dots inside names don't split."""
    return "`" + name.replace("`", "``") + "`"


def quote_path(*segments: str) -> str:
    """Quoted dotted path for nested field access, e.g. `a`.`id`."""
    return ".".join(quote(s) for s in segments)


def nest_as_col(df: DataFrame, name: str) -> Column:
    """Nest all columns of ``df`` into a single struct column ``name``."""
    return F.struct(*[df[quote(c)] for c in df.columns]).alias(name)


def empty_df_like(df: DataFrame) -> DataFrame:
    """Zero-row DataFrame with the same schema (no scan of the source)."""
    return df.limit(0)


class GraphFramesError(Exception):
    """Base error for graphframes_spark."""


class InvalidPatternError(GraphFramesError):
    """Raised for an invalid motif pattern string."""
