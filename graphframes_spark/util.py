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
# uses to parse spark.graphframes.*.intermediatestoragelevel conf values,
# resolved to (useDisk, useMemory, useOffHeap, deserialized, replication).
# NB the JVM's plain MEMORY_ONLY / MEMORY_AND_DISK are DEserialized while
# PySpark's same-named constants are serialized — conf strings follow the
# JVM (reference) semantics here, with the PySpark *_DESER spellings kept
# as aliases, so the deserialized flag survives the round trip.
_STORAGE_LEVELS = {
    "NONE": (False, False, False, False, 1),
    "DISK_ONLY": (True, False, False, False, 1),
    "DISK_ONLY_2": (True, False, False, False, 2),
    "DISK_ONLY_3": (True, False, False, False, 3),
    "MEMORY_ONLY": (False, True, False, True, 1),
    "MEMORY_ONLY_2": (False, True, False, True, 2),
    "MEMORY_ONLY_SER": (False, True, False, False, 1),
    "MEMORY_ONLY_SER_2": (False, True, False, False, 2),
    "MEMORY_ONLY_DESER": (False, True, False, True, 1),
    "MEMORY_AND_DISK": (True, True, False, True, 1),
    "MEMORY_AND_DISK_2": (True, True, False, True, 2),
    "MEMORY_AND_DISK_SER": (True, True, False, False, 1),
    "MEMORY_AND_DISK_SER_2": (True, True, False, False, 2),
    "MEMORY_AND_DISK_DESER": (True, True, False, True, 1),
    "OFF_HEAP": (True, True, True, False, 1),
}


def storage_level_from_string(name: str):
    """Parse a storage-level conf value the way the reference's Scala
    ``StorageLevel.fromString`` does (used for
    ``spark.graphframes.connectedComponents.intermediatestoragelevel``),
    accepting the ``*_SER`` / ``*_DESER`` spellings PySpark's
    ``StorageLevel`` class does not define. Raises ``GraphFramesError``
    listing the supported names on unknown input."""
    from pyspark.storagelevel import StorageLevel

    key = name.strip().upper()
    if key in _STORAGE_LEVELS:
        use_disk, use_memory, off_heap, deserialized, replication = _STORAGE_LEVELS[key]
        return StorageLevel(use_disk, use_memory, off_heap, deserialized, replication)
    raise GraphFramesError(
        f"unknown storage level {name!r}; supported: "
        f"{', '.join(sorted(_STORAGE_LEVELS))}"
    )


class InvalidPatternError(GraphFramesError):
    """Raised for an invalid motif pattern string."""
