"""Batched random walks with restart.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/rw/RandomWalkBase.scala:28-417,
rw/RandomWalkWithRestart.scala:18-88): per node, ``num_walks_per_node``
walks identified by uuid; per step, restart to the starting node with
probability ``restart_probability``, else hop to a uniformly-shuffled
sampled neighbor; walks run in batches of ``batch_size`` steps and each
batch is spilled to parquet (resumable via ``run_id`` +
``set_starting_from_batch``), then all batches are read back and
concatenated per walk id.

The reference's ``KMinSampling`` typed UDAF (expressions/KMinSampling.scala)
— a stable uniform sample of at most ``max_nbrs`` neighbors ranked by
``xxhash64(src, dst, seed)`` — is re-expressed as a ``row_number`` window
over the same hash: identical semantics, no UDAF (SURVEY §4).

Scale notes: the per-step state is one row per active walk (walk id,
start, current vertex, path array capped at batch_size); the per-step
join walks⋈neighbors is the only shuffle and both sides hash on the
current vertex. Parquet spill per batch doubles as a lineage cut and
restart point — the path arrays never exceed batch_size in memory.
Randomness note: by default, like the reference, ``rand()``/
``shuffle()`` make results run-dependent under task retry even with a
fixed seed. ``setDeterministic(True)`` swaps every random draw for a
pure hash of (walk id, step seed) — same walk distribution, but
reproducible run-to-run AND under task retry/speculative execution,
which is the safe mode on a real cluster (a retried task re-draws
``rand()`` and silently forks the walk history).
"""

from __future__ import annotations

import random
import uuid as _uuid
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphframes_spark.graphframe import GraphFrame
from graphframes_spark.util import DST, ID, SRC, GraphFramesError

RW_COL = "random_walk"
WALK_ID_COL = "random_walk_uuid"
NBRS_COL = "random_walk_nbrs"
CURR_COL = "random_walk_curr_vertex"
BATCH_COL = "random_walk_batch_it"


def sampled_neighbors(
    edges: DataFrame,
    max_nbrs: int,
    seed: int,
    use_edge_direction: bool = False,
    rank_hash: str = "xxhash64",
    ordered: bool = False,
) -> DataFrame:
    """DF[id, random_walk_nbrs]: stable uniform sample of <= max_nbrs
    neighbors per vertex — k smallest by hash(src, dst, seed)
    (reference KMinSampling semantics via a row_number window).

    ``rank_hash="md5"`` ranks by the md5 hex string of
    ``concat_ws(chr(31), src, dst, seed)`` instead of xxhash64: the same
    uniform selection, but replayable by any engine with an md5 builtin
    (the DuckDB oracle recomputes the identical k-min set). ``ordered``
    returns the array sorted by (rank, dst) rather than collect order —
    required whenever a downstream draw indexes into the array
    (``element_at``): plain ``collect_list`` order is task-scheduling-
    dependent, which would silently fork deterministic walks on retry."""
    e = edges.select(SRC, DST)
    if not use_edge_direction:
        e = e.union(edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))).distinct()
    if rank_hash == "md5":
        rank = F.md5(
            F.concat_ws(
                "\x1f",
                F.col(SRC).cast("string"),
                F.col(DST).cast("string"),
                F.lit(str(seed)),
            )
        )
    elif rank_hash == "xxhash64":
        rank = F.xxhash64(F.col(SRC), F.col(DST), F.lit(seed))
    else:
        raise GraphFramesError(f"unknown rank_hash {rank_hash!r}")
    ranked = e.withColumn("_rand_rank", rank)
    # dst tiebreak makes the order total (hash ties are ~impossible but
    # a total order costs nothing and keeps both engines byte-aligned)
    w = Window.partitionBy(SRC).orderBy("_rand_rank", DST)
    kept = ranked.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_nbrs
    )
    if ordered:
        agg = F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_rand_rank"), F.col(DST)))),
            lambda s: s[DST],
        )
    else:
        agg = F.collect_list(DST)
    return kept.groupBy(F.col(SRC).alias(ID)).agg(agg.alias(NBRS_COL))


class RandomWalkWithRestart:
    """Builder API mirroring the reference (RandomWalkBase setters)."""

    def __init__(self) -> None:
        self._graph: Optional[GraphFrame] = None
        self._max_nbrs = 50
        self._num_walks_per_node = 5
        self._batch_size = 10
        self._num_batches = 5
        self._use_edge_direction = False
        self._global_seed = 42
        self._temporary_prefix: Optional[str] = None
        self._run_id = str(_uuid.uuid4())
        self._starting_iteration = 1
        self._restart_probability = 0.1
        self._deterministic = False
        self._draw_hash = "xxhash64"

    def onGraph(self, graph: GraphFrame) -> "RandomWalkWithRestart":
        self._graph = graph
        return self

    def setMaxNbrsPerVertex(self, value: int) -> "RandomWalkWithRestart":
        self._max_nbrs = value
        return self

    def setNumWalksPerNode(self, value: int) -> "RandomWalkWithRestart":
        self._num_walks_per_node = value
        return self

    def setBatchSize(self, value: int) -> "RandomWalkWithRestart":
        self._batch_size = value
        return self

    def setNumBatches(self, value: int) -> "RandomWalkWithRestart":
        self._num_batches = value
        return self

    def setUseEdgeDirection(self, value: bool) -> "RandomWalkWithRestart":
        self._use_edge_direction = value
        return self

    def setGlobalSeed(self, value: int) -> "RandomWalkWithRestart":
        self._global_seed = value
        return self

    def setTemporaryPrefix(self, value: str) -> "RandomWalkWithRestart":
        self._temporary_prefix = value
        return self

    def setRunId(self, value: str) -> "RandomWalkWithRestart":
        if not value:
            raise GraphFramesError("empty string is not supported as run ID")
        self._run_id = value
        return self

    def getRunId(self) -> str:
        return self._run_id

    def setStartingFromBatch(self, value: int) -> "RandomWalkWithRestart":
        if value < 1:
            raise GraphFramesError(f"batches are one-indexed but got {value}")
        self._starting_iteration = value
        return self

    def setRestartProbability(self, value: float) -> "RandomWalkWithRestart":
        self._restart_probability = value
        return self

    def setDeterministic(self, value: bool) -> "RandomWalkWithRestart":
        """Hash-based randomness: walk ids become ``<start>#<k>`` and
        every restart/neighbor draw is a pure hash of
        (walk_id, step_seed) instead of ``rand()``/``shuffle()`` —
        reproducible run-to-run and retry-stable on a cluster. Neighbor
        arrays are additionally (rank, dst)-sorted so indexed draws
        cannot depend on ``collect_list`` task order."""
        self._deterministic = value
        return self

    def setDrawHash(self, value: str) -> "RandomWalkWithRestart":
        """Hash family for deterministic-mode draws and neighbor-sample
        ranking: ``"xxhash64"`` (default, cheapest) or ``"md5"`` —
        slower, but every draw is replayable by any engine with an md5
        builtin (the DuckDB oracle re-derives full walk traces on a
        general graph). Only meaningful with ``setDeterministic(True)``."""
        if value not in ("xxhash64", "md5"):
            raise GraphFramesError(f"unknown draw hash {value!r}")
        self._draw_hash = value
        return self

    # ----------------------------------------------------------------- run

    def _batch_path(self, i: int) -> str:
        prefix = self._temporary_prefix.rstrip("/")
        return f"{prefix}/{self._run_id}_batch_{i}"

    def _run_batch(
        self, neighbors: DataFrame, prev: Optional[DataFrame], iter_seed: int
    ) -> DataFrame:
        """One batch = batch_size walk steps (RandomWalkWithRestart.scala:36-88)."""
        graph = self._graph
        id_type = graph.vertices.schema[ID].dataType
        walks_dtype = T.ArrayType(id_type)

        if prev is None:
            if self._num_walks_per_node < 1:
                # sequence(1, 0) would count DOWN ([1, 0]); both modes
                # must agree that no walks start
                fresh_ids = F.array().cast("array<string>")
            elif self._deterministic:
                fresh_ids = F.transform(
                    F.sequence(F.lit(1), F.lit(self._num_walks_per_node)),
                    lambda k: F.concat_ws(
                        "#", F.col(ID).cast("string"), k.cast("string")
                    ),
                )
            else:
                fresh_ids = F.array(
                    *[F.uuid() for _ in range(self._num_walks_per_node)]
                )
            walk_ids = F.when(
                F.size(F.col(NBRS_COL)) > F.lit(0), fresh_ids
            ).otherwise(F.array().cast("array<string>"))
            starts = graph.vertices.select(ID).join(neighbors, on=ID, how="left")
            walks = starts.select(
                F.col(ID).alias("startingNode"),
                F.col(ID).alias(CURR_COL),
                F.explode(walk_ids).alias(WALK_ID_COL),
                F.array().cast(walks_dtype).alias(RW_COL),
            )
        else:
            walks = prev.select(
                "startingNode",
                CURR_COL,
                WALK_ID_COL,
                F.array().cast(walks_dtype).alias(RW_COL),
            )

        rng = random.Random(iter_seed)
        for _ in range(self._batch_size):
            step_seed = rng.getrandbits(63)
            if self._deterministic and self._draw_hash == "md5":
                # md5-unit draws (first 12 hex chars over 16^12) with a
                # salt per draw kind: bit-replayable by the DuckDB
                # oracle via the same three builtins
                def _md5_unit(salt: str, _seed=step_seed):
                    return F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    "\x1f",
                                    F.col(WALK_ID_COL),
                                    F.lit(str(_seed)),
                                    F.lit(salt),
                                )
                            ),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("bigint")

                restart_draw = _md5_unit("r") / F.lit(float(16**12))
                nbr_pick = F.element_at(
                    F.col(NBRS_COL),
                    (F.pmod(_md5_unit("n"), F.size(F.col(NBRS_COL))) + 1).cast(
                        "int"
                    ),
                )
            elif self._deterministic:
                # pure hash of (walk id, step seed): identical across
                # runs and task retries, uniform enough for walk draws
                restart_draw = (
                    F.pmod(
                        F.xxhash64(F.col(WALK_ID_COL), F.lit(step_seed)),
                        F.lit(1_000_000_000),
                    )
                    / F.lit(1_000_000_000.0)
                )
                nbr_pick = F.element_at(
                    F.col(NBRS_COL),
                    (
                        F.pmod(
                            F.xxhash64(
                                F.col(WALK_ID_COL), F.lit(step_seed), F.lit(1)
                            ),
                            F.size(F.col(NBRS_COL)),
                        )
                        + 1
                    ).cast("int"),
                )
            else:
                restart_draw = F.rand(step_seed)
                nbr_pick = F.element_at(F.shuffle(F.col(NBRS_COL)), 1)
            walks = (
                walks.join(neighbors, F.col(ID) == F.col(CURR_COL), "left")
                # strict <: identical in distribution (P(draw == p) = 0
                # for the continuous rand() path, and the hash draw is
                # k/1e9 in [0, 1)), but it makes restart_probability=0.0
                # EXACTLY never-restart — a zero-valued hash draw must
                # not restart, which the forced-walk oracle relies on
                .withColumn(
                    "doRestart", restart_draw < F.lit(self._restart_probability)
                )
                .withColumn(
                    "nextNode",
                    F.when(F.col("doRestart"), F.col("startingNode")).otherwise(
                        nbr_pick
                    ),
                )
                .select(
                    F.col(WALK_ID_COL),
                    F.col("startingNode"),
                    F.col("nextNode").alias(CURR_COL),
                    F.array_append(F.col(RW_COL), F.col(CURR_COL)).alias(RW_COL),
                )
            )
        return walks

    def run(self) -> DataFrame:
        """DF[random_walk_uuid, random_walk: array<idType>]."""
        if self._graph is None:
            raise GraphFramesError("Graph is not set")
        if self._temporary_prefix is None:
            raise GraphFramesError("Temporary prefix is required for random walks.")

        spark = self._graph.spark
        rng = random.Random(self._global_seed)
        # skip seeds for already-finished batches (resume consistency)
        for _ in range(1, self._starting_iteration):
            rng.getrandbits(63)

        for i in range(self._starting_iteration, self._num_batches + 1):
            iter_seed = rng.getrandbits(63)
            neighbors = sampled_neighbors(
                self._graph.edges,
                self._max_nbrs,
                iter_seed,
                self._use_edge_direction,
                rank_hash=self._draw_hash if self._deterministic else "xxhash64",
                ordered=self._deterministic,
            )
            prev = (
                None if i == 1 else spark.read.parquet(self._batch_path(i - 1))
            )
            result = self._run_batch(neighbors, prev, iter_seed).withColumn(
                BATCH_COL, F.lit(i)
            )
            result.write.mode("overwrite").parquet(self._batch_path(i))

        batches = [
            spark.read.parquet(self._batch_path(i))
            for i in range(1, self._num_batches + 1)
        ]
        all_batches = batches[0]
        for b in batches[1:]:
            all_batches = all_batches.union(b)

        id_type = self._graph.vertices.schema[ID].dataType
        sorted_parts = F.array_sort(
            F.collect_list(F.struct(F.col(BATCH_COL), F.col(RW_COL)))
        )
        concatenated = F.aggregate(
            sorted_parts,
            F.array().cast(T.ArrayType(id_type)),
            lambda acc, x: F.concat(acc, x[RW_COL]),
        )
        return all_batches.groupBy(WALK_ID_COL).agg(concatenated.alias(RW_COL))
