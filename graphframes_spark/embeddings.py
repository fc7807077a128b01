"""Node embeddings from random-walk sequences.

- ``hash2vec``: feature-hashing embeddings (Argerich et al. 2016),
  following the reference
  (/root/reference/core/src/main/scala/org/graphframes/embeddings/Hash2Vec.scala:48-584):
  for each target token in a walk, context tokens within ``window`` add
  a signed (hash-derived), distance-decayed contribution at a hashed
  index of the target's vector; vectors are summed per token across all
  sequences and L2-normalized. The reference drops to RDD mapPartitions
  + BLAS; here the per-partition accumulation is an Arrow-batched
  ``mapInPandas`` with numpy, and the cross-partition combine is one
  groupBy(id) of ``dim`` unrolled per-position sums (partial-
  aggregatable, no driver-side state).
- ``RandomWalkEmbeddings``: orchestrates walks → Word2Vec
  (pyspark.ml, JVM-native) or hash2vec, with optional GraphSAGE-ish
  neighbor mean-aggregation
  (embeddings/RandomWalkEmbeddings.scala:46-367).
- ``sampling_convolution``: one convolution layer — mean of <= k
  sampled neighbor vectors, optionally concatenated with the vertex's
  own (convolutions/SamplingConvolution.scala:24-177).

Scale notes: hash2vec state per Python worker is a dict bounded by the
*vocabulary per partition* × dim; walks are typically grouped by start
vertex so vocabulary locality is decent. Word2Vec is delegated to
pyspark.ml (distributed, JVM). The convolution is joins + a bounded
array aggregation (<= k vectors per vertex by construction).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_spark.graphframe import GraphFrame
from graphframes_spark.rw import NBRS_COL, RW_COL, RandomWalkWithRestart, sampled_neighbors
from graphframes_spark.util import ID, GraphFramesError

VECTOR_COL = "vector"


def _sum_vectors(
    df: DataFrame, key: str, vec_col: str, dim: Optional[int] = None
) -> DataFrame:
    """groupBy(key) element-wise sum of an array<double> column.

    With a plan-time ``dim`` the array unrolls to ``dim`` scalar
    ``sum(element_at(...))`` aggregates — one shuffle, full map-side
    partial aggregation. Without it (vector width unknown until
    runtime), fall back to posexplode → groupBy(key, pos) → sum →
    reassemble; agg state stays bounded by the width either way."""
    if dim is not None:
        return df.groupBy(key).agg(
            F.array(
                *[F.sum(F.element_at(F.col(vec_col), i + 1)) for i in range(dim)]
            ).alias(vec_col)
        )
    exploded = df.select(F.col(key), F.posexplode(F.col(vec_col)).alias("_p", "_v"))
    per_pos = exploded.groupBy(key, "_p").agg(F.sum("_v").alias("_v"))
    return per_pos.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_p", "_v"))), lambda s: s["_v"]
        ).alias(vec_col)
    )


def hash2vec(
    sequences: DataFrame,
    seq_col: str = RW_COL,
    dim: int = 64,
    window: int = 3,
    decay: str = "gaussian",
    sigma: float = 1.0,
    normalize: bool = True,
    index_seed: int = 0,
    sign_seed: int = 1,
) -> DataFrame:
    """DF[id, vector: array<double>] from DF[<seq_col>: array<id>].

    ``decay``: 'gaussian' (exp(-d²/2σ²)) or 'constant' (1.0) weighting of
    a context token at distance d (Hash2Vec.scala decay options).
    ``index_seed`` / ``sign_seed`` salt the feature-index and sign hashes
    (Hash2Vec.scala hashingSeed / signSeed).
    """
    import numpy as np
    import pandas as pd

    if decay not in ("gaussian", "constant"):
        raise GraphFramesError(f"unknown decay: {decay!r}")
    weights = [
        1.0 if decay == "constant" else math.exp(-(d * d) / (2.0 * sigma * sigma))
        for d in range(1, window + 1)
    ]

    # the reference hashes with murmur3 (JVM-side); murmur3 is unavailable
    # here, so index/sign hashing uses stable blake2b — same structure,
    # different (still deterministic) hash family
    import hashlib

    def _h(token: str, salt: int) -> int:
        digest = hashlib.blake2b(
            f"{salt}:{token}".encode(), digest_size=8
        ).digest()
        return int.from_bytes(digest, "big")

    def accumulate(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict[str, "np.ndarray"] = {}
        for pdf in batches:
            for seq in pdf[seq_col]:
                toks = [str(t) for t in seq]
                for i, target in enumerate(toks):
                    vec = acc.get(target)
                    if vec is None:
                        vec = acc.setdefault(target, np.zeros(dim))
                    for d in range(1, window + 1):
                        w = weights[d - 1]
                        for j in (i - d, i + d):
                            if 0 <= j < len(toks):
                                ctx = toks[j]
                                idx = _h(ctx, index_seed) % dim
                                sign = 1.0 if _h(ctx, sign_seed) & 1 else -1.0
                                vec[idx] += sign * w
        # dtype=object keeps empty partitions Arrow-convertible (an empty
        # float64 ndarray column cannot convert to list<double>)
        yield pd.DataFrame(
            {
                ID: pd.Series(list(acc.keys()), dtype=object),
                VECTOR_COL: pd.Series(
                    [v.tolist() for v in acc.values()], dtype=object
                ),
            }
        )

    partials = sequences.select(seq_col).mapInPandas(
        accumulate, schema=f"{ID} string, {VECTOR_COL} array<double>"
    )
    summed = _sum_vectors(partials, ID, VECTOR_COL, dim=dim)
    if not normalize:
        return summed
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(VECTOR_COL), lambda x: x * x),
            F.lit(0.0),
            lambda acc_, x: acc_ + x,
        )
    )
    return summed.withColumn(
        VECTOR_COL,
        F.when(
            norm > 0, F.transform(F.col(VECTOR_COL), lambda x: x / norm)
        ).otherwise(F.col(VECTOR_COL)),
    )


class RandomWalkEmbeddings:
    """Walks → embeddings orchestrator (RandomWalkEmbeddings.scala:46-367)."""

    def __init__(self) -> None:
        self._graph: Optional[GraphFrame] = None
        self._walks: Optional[RandomWalkWithRestart] = None
        self._algorithm = "word2vec"  # or "hash2vec"
        self._dim = 64
        self._window = 3
        self._with_neighbor_aggregation = False
        self._max_nbrs = 10
        self._seed = 42
        self._vector_output = False

    def onGraph(self, graph: GraphFrame) -> "RandomWalkEmbeddings":
        self._graph = graph
        return self

    def setRandomWalk(self, rw: RandomWalkWithRestart) -> "RandomWalkEmbeddings":
        self._walks = rw
        return self

    def setAlgorithm(self, value: str) -> "RandomWalkEmbeddings":
        if value not in ("word2vec", "hash2vec"):
            raise GraphFramesError(f"unknown embeddings algorithm: {value!r}")
        self._algorithm = value
        return self

    def setDimension(self, value: int) -> "RandomWalkEmbeddings":
        self._dim = value
        return self

    def setWindowSize(self, value: int) -> "RandomWalkEmbeddings":
        self._window = value
        return self

    def setWithNeighborAggregation(self, value: bool) -> "RandomWalkEmbeddings":
        self._with_neighbor_aggregation = value
        return self

    def setMaxNbrsPerVertex(self, value: int) -> "RandomWalkEmbeddings":
        self._max_nbrs = value
        return self

    def setSeed(self, value: int) -> "RandomWalkEmbeddings":
        self._seed = value
        return self

    def setVectorOutput(self, value: bool) -> "RandomWalkEmbeddings":
        """Return ``vector`` as a pyspark.ml dense vector (the reference's
        native type — Hash2Vec.scala:40-47) instead of array<double>."""
        self._vector_output = value
        return self

    def run(self) -> DataFrame:
        """DF[id: string, vector: array<double>] (ids stringified — both
        Word2Vec and feature hashing operate on token strings); ml
        ``VectorUDT`` instead when ``setVectorOutput(True)``."""
        if self._graph is None:
            raise GraphFramesError("Graph is not set")
        if self._walks is None:
            raise GraphFramesError("set a RandomWalkWithRestart via setRandomWalk")

        walks = self._walks.onGraph(self._graph).run()
        seqs = walks.select(
            F.transform(F.col(RW_COL), lambda x: x.cast("string")).alias(RW_COL)
        ).filter(F.size(RW_COL) > 0)

        if self._algorithm == "hash2vec":
            emb = hash2vec(seqs, RW_COL, dim=self._dim, window=self._window)
        else:
            from pyspark.ml.feature import Word2Vec

            w2v = Word2Vec(
                vectorSize=self._dim,
                windowSize=self._window,
                minCount=1,
                seed=self._seed,
                inputCol=RW_COL,
                outputCol="_w2v",
            )
            model = w2v.fit(seqs)
            from pyspark.ml.functions import vector_to_array

            emb = model.getVectors().select(
                F.col("word").alias(ID),
                vector_to_array(F.col("vector")).alias(VECTOR_COL),
            )

        if self._with_neighbor_aggregation:
            emb = sampling_convolution(
                self._graph, emb, k=self._max_nbrs, seed=self._seed,
                concat_self=True, id_as_string=True,
            )
        if self._vector_output:
            from pyspark.ml.functions import array_to_vector

            emb = emb.withColumn(VECTOR_COL, array_to_vector(F.col(VECTOR_COL)))
        return emb


def sampling_convolution(
    graph: GraphFrame,
    embeddings: DataFrame,
    k: int = 10,
    seed: int = 42,
    concat_self: bool = True,
    use_edge_direction: bool = False,
    id_as_string: bool = False,
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """One sampled-neighbor convolution: mean of <= k neighbor vectors,
    optionally concatenated after the vertex's own vector
    (SamplingConvolution.scala:24-177). Embeddings: DF[id, vector].
    ``rank_hash="md5"`` makes the k-min neighbor selection replayable by
    an external SQL engine (see ``sampled_neighbors``)."""
    nbrs = sampled_neighbors(graph.edges, k, seed, use_edge_direction, rank_hash)
    pairs = nbrs.select(F.col(ID), F.explode(F.col(NBRS_COL)).alias("_nbr"))
    if id_as_string:
        pairs = pairs.select(
            F.col(ID).cast("string").alias(ID), F.col("_nbr").cast("string").alias("_nbr")
        )
    nbr_vecs = pairs.join(
        embeddings.select(F.col(ID).alias("_nbr"), F.col(VECTOR_COL).alias("_nv")),
        on="_nbr",
    )
    summed = _sum_vectors(nbr_vecs.select(ID, F.col("_nv")), ID, "_nv")
    counts = nbr_vecs.groupBy(ID).agg(F.count("*").alias("_n"))
    mean = summed.join(counts, on=ID).select(
        F.col(ID),
        F.transform(F.col("_nv"), lambda x: x / F.col("_n")).alias("_mean"),
    )
    out = embeddings.join(mean, on=ID, how="left").withColumn(
        "_mean",
        F.coalesce(
            F.col("_mean"),
            F.transform(F.col(VECTOR_COL), lambda x: x * F.lit(0.0)),
        ),
    )
    if concat_self:
        return out.select(
            F.col(ID), F.concat(F.col(VECTOR_COL), F.col("_mean")).alias(VECTOR_COL)
        )
    return out.select(F.col(ID), F.col("_mean").alias(VECTOR_COL))


class RwEmbeddings:
    """Snake-case random-walk-embeddings builder matching the reference
    python client surface (python/graphframes/graphframe.py:1160-1253):
    ``g.rw_embeddings`` → ``set_rw_model(...)`` or
    ``use_cached_random_walks(path)`` → ``set_hash2vec(...)`` /
    ``set_word2vec(...)`` [→ ``set_neighbors_aggregation(...)``] →
    ``run()``.

    Deviations: ``save_norm`` maps to the zero-norm guard this engine's
    L2 normalization always applies, and hash seeds salt a blake2b
    hasher rather than JVM murmur3 (same structure, different family —
    see ``hash2vec``)."""

    _HASH2VEC_DECAY_FUNCTIONS = ("gaussian", "constant")

    def __init__(self, graph: GraphFrame) -> None:
        self._graph = graph
        self._cached_walks: Optional[str] = None
        self._rw: Optional[RandomWalkWithRestart] = None
        self._sequence_model: Optional[str] = None
        self._h2v: dict = {}
        self._w2v: dict = {}
        self._aggregate_neighbors = False
        self._agg_max_nbrs = 50
        self._agg_seed = 42
        self._clean_up = False

    def use_cached_random_walks(self, cached_walks_path: str) -> None:
        if cached_walks_path == "":
            raise ValueError("cached walks path cannot be empty")
        self._cached_walks = cached_walks_path

    def set_rw_model(
        self,
        temporary_prefix: str,
        use_edge_direction: bool = False,
        max_neighbors_per_vertex: int = 50,
        num_walks_per_node: int = 5,
        num_batches: int = 5,
        walks_per_batch: int = 10,
        restart_probability: float = 0.1,
        seed: int = 42,
    ) -> None:
        self._rw = (
            RandomWalkWithRestart()
            .setTemporaryPrefix(temporary_prefix)
            .setUseEdgeDirection(use_edge_direction)
            .setMaxNbrsPerVertex(max_neighbors_per_vertex)
            .setNumWalksPerNode(num_walks_per_node)
            .setNumBatches(num_batches)
            .setBatchSize(walks_per_batch)
            .setRestartProbability(restart_probability)
            .setGlobalSeed(seed)
        )

    def set_hash2vec(
        self,
        context_size: int = 5,
        num_partitions: int = 5,
        embeddings_dim: int = 512,
        decay_function: str = "gaussian",
        gaussian_sigma: float = 1.0,
        hashing_seed: int = 42,
        sign_seed: int = 18,
        l2_norm: bool = True,
        save_norm: bool = True,
    ) -> None:
        if decay_function not in self._HASH2VEC_DECAY_FUNCTIONS:
            raise ValueError(
                f"supported decay functions are {self._HASH2VEC_DECAY_FUNCTIONS}"
            )
        self._sequence_model = "hash2vec"
        self._h2v = dict(
            window=context_size,
            num_partitions=num_partitions,
            dim=embeddings_dim,
            decay=decay_function,
            sigma=gaussian_sigma,
            index_seed=hashing_seed,
            sign_seed=sign_seed,
            normalize=l2_norm,
        )

    def set_word2vec(
        self,
        max_iter: int = 1,
        embeddings_dim: int = 100,
        window_size: int = 5,
        num_partitions: int = 1,
        min_count: int = 5,
        max_sentence_length: int = 1000,
        seed: int = 42,
        step_size: float = 0.025,
    ) -> None:
        self._sequence_model = "word2vec"
        self._w2v = dict(
            maxIter=max_iter,
            vectorSize=embeddings_dim,
            windowSize=window_size,
            numPartitions=num_partitions,
            minCount=min_count,
            maxSentenceLength=max_sentence_length,
            seed=seed,
            stepSize=step_size,
        )

    def unset_neighbors_aggregation(self) -> None:
        self._aggregate_neighbors = False

    def set_neighbors_aggregation(self, max_neighbors: int = 50, seed: int = 42) -> None:
        self._aggregate_neighbors = True
        self._agg_max_nbrs = max_neighbors
        self._agg_seed = seed

    def set_clean_up_after_run(self, clean_up: bool = True) -> None:
        self._clean_up = clean_up

    def run(self) -> DataFrame:
        """DF[id: string, vector: array<double>]."""
        spark = self._graph.spark
        if self._cached_walks is not None:
            walks = spark.read.parquet(self._cached_walks)
            if RW_COL not in walks.columns:
                raise GraphFramesError(
                    f"cached walks at {self._cached_walks} lack a {RW_COL!r} column"
                )
        elif self._rw is not None:
            walks = self._rw.onGraph(self._graph).run()
        else:
            raise ValueError("TMP path or cached walks path should be provided!")
        if self._sequence_model is None:
            raise ValueError("set a sequence model via set_hash2vec or set_word2vec")

        seqs = walks.select(
            F.transform(F.col(RW_COL), lambda x: x.cast("string")).alias(RW_COL)
        ).filter(F.size(RW_COL) > 0)

        if self._sequence_model == "hash2vec":
            params = dict(self._h2v)
            n_parts = params.pop("num_partitions")
            # partial maps accumulate per partition: the partition count
            # bounds both parallelism and per-worker vocabulary size
            emb = hash2vec(seqs.repartition(n_parts), RW_COL, **params)
        else:
            from pyspark.ml.feature import Word2Vec
            from pyspark.ml.functions import vector_to_array

            w2v = Word2Vec(inputCol=RW_COL, outputCol="_w2v", **self._w2v)
            model = w2v.fit(seqs)
            emb = model.getVectors().select(
                F.col("word").alias(ID),
                vector_to_array(F.col("vector")).alias(VECTOR_COL),
            )

        if self._aggregate_neighbors:
            emb = sampling_convolution(
                self._graph,
                emb,
                k=self._agg_max_nbrs,
                seed=self._agg_seed,
                concat_self=True,
                id_as_string=True,
            )

        if self._clean_up and self._rw is not None and self._cached_walks is None:
            # walk batches feed the (lazy) result plan, so materialize
            # before deleting them out from under it
            emb = emb.localCheckpoint(eager=True)
            import shutil

            prefix = self._rw._temporary_prefix.rstrip("/")
            run_id = self._rw.getRunId()
            for i in range(1, self._rw._num_batches + 1):
                shutil.rmtree(f"{prefix}/{run_id}_batch_{i}", ignore_errors=True)
        return emb
