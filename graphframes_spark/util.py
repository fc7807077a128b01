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


# Names accepted by the JVM-side StorageLevel.fromString that the reference
# uses to parse spark.graphframes.*.intermediatestoragelevel conf values.
# Python-side storage is always serialized, so the *_SER spellings map onto
# the plain PySpark levels; *_DESER is the reference python client's default
# spelling for deserialized memory.
_STORAGE_LEVEL_ALIASES = {
    "MEMORY_ONLY_SER": "MEMORY_ONLY",
    "MEMORY_ONLY_SER_2": "MEMORY_ONLY_2",
    "MEMORY_AND_DISK_SER": "MEMORY_AND_DISK",
    "MEMORY_AND_DISK_SER_2": "MEMORY_AND_DISK_2",
    "MEMORY_ONLY_DESER": "MEMORY_ONLY",
    "MEMORY_AND_DISK_DESER": "MEMORY_AND_DISK",
}

_STORAGE_LEVEL_NAMES = (
    "NONE",
    "DISK_ONLY",
    "DISK_ONLY_2",
    "DISK_ONLY_3",
    "MEMORY_ONLY",
    "MEMORY_ONLY_2",
    "MEMORY_AND_DISK",
    "MEMORY_AND_DISK_2",
    "OFF_HEAP",
)


def storage_level_from_string(name: str):
    """Parse a storage-level conf value the way the reference's Scala
    ``StorageLevel.fromString`` does (used for
    ``spark.graphframes.connectedComponents.intermediatestoragelevel``),
    accepting the ``*_SER`` / ``*_DESER`` spellings PySpark's
    ``StorageLevel`` class does not define. Raises ``GraphFramesError``
    listing the supported names on unknown input."""
    from pyspark.storagelevel import StorageLevel

    key = name.strip().upper()
    key = _STORAGE_LEVEL_ALIASES.get(key, key)
    if key == "NONE":
        return StorageLevel(False, False, False, False)
    if key in _STORAGE_LEVEL_NAMES and hasattr(StorageLevel, key):
        return getattr(StorageLevel, key)
    supported = sorted(set(_STORAGE_LEVEL_NAMES) | set(_STORAGE_LEVEL_ALIASES))
    raise GraphFramesError(
        f"unknown storage level {name!r}; supported: {', '.join(supported)}"
    )


class InvalidPatternError(GraphFramesError):
    """Raised for an invalid motif pattern string."""
