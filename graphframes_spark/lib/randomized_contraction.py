"""Connected components via randomized contraction (Bögeholz et al.,
"In-database connected component analysis", ICDE 2020).

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/lib/RandomizedContraction.scala:33-273,
expressions/FiniteAXPlusB.scala): per round, hash every vertex id with a
random GF(2^64) linear map ``a·x + b`` (carry-less multiply mod
x^64+x^4+x^3+x+1), contract each vertex into its minimum hashed
neighbor, and spill the round's representative table to parquet; when no
edges remain, replay the tables in reverse — composing the linear maps
algebraically — to assign every original vertex its component label
(an opaque hashed long; ``use_labels_as_components`` maps back to min
original ids).

The reference's custom codegen expression ``_axpb`` is re-expressed as
an Arrow-batched pandas UDF: the ``a``-side doubling sequence is
data-independent, so it is precomputed into a 64-entry table and each
batch reduces to 64 vectorized shift/mask/xor passes in numpy.

Scale notes: per round one groupBy-min and two joins over a shrinking
edge set; parquet spill doubles as free checkpointing (the reference's
trick), so lineage never grows; the reverse replay touches each level's
table exactly once. Random draws happen on the driver (two longs per
round) — results are deterministic for a fixed seed up to Spark-level
retry nondeterminism-free (the hashing itself is pure).
"""

from __future__ import annotations

import random
import shutil
import tempfile
import warnings
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from graphframes_spark.indexing import has_integral_id_type, indexed_edges, indexed_vertices
from graphframes_spark.util import ATTR, DST, ID, LONG_DST, LONG_ID, LONG_SRC, SRC

if TYPE_CHECKING:
    from graphframes_spark.graphframe import GraphFrame

COMPONENT = "component"

_IRRPOLY = 0x1B
_M64 = (1 << 64) - 1
_TOP = 1 << 63


def axpb_scalar(a: int, x: int, b: int) -> int:
    """GF(2^64) a·x + b (FiniteAXPlusB.axpb), on Python ints (unsigned)."""
    a &= _M64
    x &= _M64
    r = 0
    while x:
        if x & 1:
            r ^= a
        x >>= 1
        a = ((a << 1) ^ _IRRPOLY) & _M64 if a & _TOP else (a << 1) & _M64
    return r ^ (b & _M64)


def _to_signed(v: int) -> int:
    v &= _M64
    return v - (1 << 64) if v >= _TOP else v


def _axpb_udf(a: int, b: int):
    """Vectorized GF(2^64) a·x+b over a long column: precompute the
    data-independent a·2^i table, then 64 shift/mask/xor passes per
    Arrow batch."""
    import numpy as np

    table = []
    cur = a & _M64
    for _ in range(64):
        table.append(cur)
        cur = ((cur << 1) ^ _IRRPOLY) & _M64 if cur & _TOP else (cur << 1) & _M64
    tbl = [np.uint64(t) for t in table]
    b_u = np.uint64(b & _M64)

    @pandas_udf("long")
    def f(x: pd.Series) -> pd.Series:
        xv = x.to_numpy(dtype=np.int64).view(np.uint64)
        r = np.zeros_like(xv)
        one = np.uint64(1)
        for i in range(64):
            bit = (xv >> np.uint64(i)) & one
            r ^= tbl[i] * bit
        r ^= b_u
        return pd.Series(r.view(np.int64))

    return f


def _scratch_dir(spark) -> str:
    try:
        ckpt = spark.sparkContext.getCheckpointDir()
    except Exception:
        ckpt = None
    if ckpt is None:
        ckpt = spark.conf.get("spark.checkpoint.dir", None)
    if ckpt is not None:
        return f"{ckpt.rstrip('/')}/randomized-contraction-{random.getrandbits(32):08x}"
    master = ""
    try:
        master = spark.conf.get("spark.master", "") or ""
    except Exception:
        pass
    if master and not master.startswith("local"):
        # A driver-local temp dir is invisible to remote executors: the
        # per-round parquet spill would silently read back empty/partial
        # tables. Refuse instead of being wrong-by-default.
        raise RuntimeError(
            "randomized_contraction spills per-round representative tables "
            f"to storage every executor can read; spark.master={master!r} "
            "is multi-node but no checkpoint dir is set. Call "
            "spark.sparkContext.setCheckpointDir(<shared path>) (HDFS/S3/"
            "NFS) before running, or use the default two-phase "
            "connectedComponents which needs only localCheckpoint."
        )
    tmp = tempfile.mkdtemp(prefix="gfs-randomized-contraction-")
    if not master:
        # master unknown (e.g. Spark Connect with no conf visibility):
        # a driver-local dir would silently break remote executors, so
        # warn; on an explicit local[*] master the temp dir is simply
        # correct (executors ARE the driver process) and a warning
        # would be noise.
        warnings.warn(
            "randomized_contraction is spilling representative tables to a "
            f"driver-local temp dir ({tmp}); set a checkpoint dir on shared "
            "storage for multi-node clusters.",
            RuntimeWarning,
        )
    return tmp


def randomized_contraction(
    graph: "GraphFrame",
    checkpoint_interval: int = 2,
    use_labels_as_components: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Component label per vertex: DF[<vertex columns... as id>, component]."""
    spark = graph.spark
    storage_parent = _scratch_dir(spark)

    def table_name(i: int) -> str:
        return f"{storage_parent}/ccreps-{i}"

    idx_v = indexed_vertices(graph.vertices)
    vv = idx_v.select(F.col(LONG_ID).alias(ID))
    raw_e = indexed_edges(graph.edges, idx_v).select(
        F.col(LONG_SRC).alias(SRC), F.col(LONG_DST).alias(DST)
    )
    edges = (
        raw_e.union(raw_e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .persist()
    )

    rng = random.Random(seed)
    stack: list[tuple[int, int]] = []
    it = 0
    graph_size = edges.count()

    try:
        while graph_size > 0:
            it += 1
            r_a = 0
            while r_a == 0:
                r_a = rng.getrandbits(64)
            r_b = rng.getrandbits(64)
            stack.append((r_a, r_b))
            h = _axpb_udf(r_a, r_b)

            reps = (
                edges.groupBy(SRC)
                .agg(F.min(h(F.col(DST))).alias("rep"))
                .select(
                    F.col(SRC).alias("v"),
                    F.least(h(F.col(SRC)), F.col("rep")).alias("rep"),
                )
            )
            # parquet round-trip = free checkpoint (reference trick)
            reps.write.parquet(table_name(it))
            reps = spark.read.parquet(table_name(it))

            edges2 = edges.join(reps, edges[SRC] == reps["v"]).select(
                F.col("rep").alias(SRC), F.col(DST)
            )
            old_edges = edges
            r2 = reps.select(F.col("v").alias("_v2"), F.col("rep").alias("_rep2"))
            new_edges = (
                edges2.join(
                    r2,
                    (edges2[DST] == r2["_v2"]) & (edges2[SRC] != r2["_rep2"]),
                )
                .select(F.col(SRC), F.col("_rep2").alias(DST))
                .distinct()
            )
            if checkpoint_interval > 0 and it % checkpoint_interval == 0:
                edges = new_edges.localCheckpoint(eager=False)
            else:
                edges = new_edges.persist()
            graph_size = edges.count()
            old_edges.unpersist()

        # reverse replay: compose the per-level hashes algebraically.
        # Merged tables are written under a new suffix and the per-level
        # path map updated — no renames, so any Hadoop-visible storage
        # (HDFS, S3, file:) works, not just the driver's local disk.
        paths = {lvl: table_name(lvl) for lvl in range(1, it + 1)}
        acc_a, acc_b = 1, 0
        level = it
        while level > 1:
            level -= 1
            popped_a, popped_b = stack.pop()
            old_acc_a = acc_a
            acc_a = axpb_scalar(old_acc_a, popped_a, 0)
            acc_b = axpb_scalar(old_acc_a, popped_b, acc_b)
            h = _axpb_udf(acc_a, acc_b)

            r1 = spark.read.parquet(paths[level]).alias("r1")
            r2 = spark.read.parquet(paths[level + 1]).alias("r2")
            merged = r1.join(
                r2, F.col("r1.rep") == F.col("r2.v"), "left_outer"
            ).select(
                F.col("r1.v").alias("v"),
                F.coalesce(F.col("r2.rep"), h(F.col("r1.rep"))).alias("rep"),
            )
            merged.write.parquet(table_name(level) + "-m")
            paths[level] = table_name(level) + "-m"

        if it == 0:
            # no edges at all: every vertex is its own component
            out = idx_v.select(
                F.col(ATTR + ".*")
            ).withColumn(COMPONENT, F.col(ID).cast("long") if has_integral_id_type(
                graph.vertices) else F.col(ID))
            return out

        final_reps = spark.read.parquet(paths[1]).select(
            F.col("v").alias(LONG_ID), F.col("rep").alias(COMPONENT)
        )
        labeled = idx_v.join(final_reps, on=LONG_ID, how="left")
        if use_labels_as_components:
            labels = labeled.filter(F.col(COMPONENT).isNotNull()).groupBy(
                COMPONENT
            ).agg(F.min(F.col(ATTR)[ID]).alias("_new_component"))
            out = (
                labeled.join(labels, on=COMPONENT, how="left")
                .select(
                    F.col(ATTR + ".*"),
                    F.coalesce(F.col("_new_component"), F.col(ATTR)[ID]).alias(
                        "_cmp"
                    ),
                )
                .withColumnRenamed("_cmp", COMPONENT)
            )
        else:
            # isolated vertices: own (long) id as component
            out = labeled.select(
                F.col(ATTR + ".*"),
                F.coalesce(F.col(COMPONENT), F.col(LONG_ID)).alias(COMPONENT),
            )
        out = out.persist()
        out.count()
        return out
    finally:
        edges.unpersist()
        # best-effort local cleanup; file: URIs are normalized, non-local
        # schemes (hdfs://, s3://) are left for storage lifecycle policies
        local = storage_parent
        if local.startswith("file:"):
            local = local[len("file:") :]
        if "://" not in local:
            try:
                shutil.rmtree(local, ignore_errors=True)
            except Exception:
                pass
