"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query against the
  full corpus — the correctness baseline. Quadratic: use for oracle
  validation and small query batches only.
- ``lsh_topk``: random-hyperplane-bucketed approximate top-k — the scale
  path. Candidates are corpus vectors sharing the query's sign-sketch
  bucket; one shuffle keyed on the sketch, per-bucket work bounded.
- ``ivf_topk``: IVF-style two-stage search — KMeans coarse quantizer
  (pyspark.ml), probe the ``nprobe`` nearest centroids, exact rerank
  within the probed cells. The classic 100 TB layout: partition/bucket
  the corpus by centroid id so a query touches nprobe/k of the data.

All distance math is JVM-side column algebra (``zip_with`` +
``aggregate`` folds) — no Python in the hot path. Hyperplanes are
deterministic (hash-derived), so results are stable under retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphframes_spark.datapipe.dedup import cosine_similarity

ID = "id"


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _unit(vec: Column) -> Column:
    """L2-normalized double vector: pairs then need only a dot product."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(vec, lambda x: x.cast("double") / norm)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def hyperplane_sketch(vec: Column, num_planes: int, dim_hint: int = 64) -> Column:
    """Sign sketch of ``vec`` against ``num_planes`` deterministic random
    hyperplanes, packed into a long (``dim_hint`` retained for API
    compatibility; the planes adapt to the vector's size). Since round 8
    this is the single-band case of the engine-portable banded scheme
    (``datapipe.dedup.banded_hyperplane_sketches``): 3-round-LCG integer
    plane components over the 4096-quantized vector, so bucket
    membership is bit-identical across engines AND partitionings — the
    DuckDB oracle replays the approximate path's buckets exactly (the
    previous xxhash64 planes were retry-stable but not replayable)."""
    from graphframes_spark.datapipe.dedup import banded_hyperplane_sketches

    return F.element_at(banded_hyperplane_sketches(vec, num_planes, 1), 1)["sketch"]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: DF[query_id, neighbor_id, rank] (rank 1..k,
    self-matches excluded, ties broken by neighbor id)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("_qv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", _dot(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k within the query's hyperplane bucket. Same output
    schema as ``brute_force_topk``; recall depends on num_planes (fewer
    planes -> bigger buckets -> higher recall & cost)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("_cv")
    ).withColumn("_sketch", hyperplane_sketch(F.col("_cv"), num_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("_qv")
    ).withColumn("_sketch", hyperplane_sketch(F.col("_qv"), num_planes))
    scored = (
        q.join(c, on="_sketch")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", _dot(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    num_cells: int = 16,
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    deterministic: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Train the IVF coarse quantizer and assign the corpus to cells —
    returns ``(assigned, centroids)``:

    - ``assigned``: DF[neighbor_id, _cv: array<double> (unit-normalized),
      _cell: int] — the inverted file. At scale, write it once
      partitioned/bucketed by ``_cell`` (``assigned.write
      .partitionBy("_cell")``) so every later search prunes to the
      probed cells at the parquet scan.
    - ``centroids``: DF[_cell, _centroid: array<double>] — num_cells
      rows, broadcast at search time.

    Both round-trip losslessly through parquet, so the index is built
    once and amortized across query batches — the realistic 100 TB ANN
    shape (index build is the expensive pass; searches are cheap
    cell-pruned scans).

    ``deterministic=True`` (beyond-reference, round 8) replaces the
    seeded ml-KMeans quantizer with a hash-seeded MEDOID codebook: the
    ``num_cells`` corpus rows with the smallest ``md5(id)`` become the
    cell centroids (FAISS-style sampled coarse codebook, zero Lloyd
    rounds), and every corpus row is assigned to its max-cosine centroid
    with ties broken by cell index. Bit-stable across runs, retries, and
    partitionings, and every step is plain relational algebra — the
    whole IVF pipeline then has a full-value SQL oracle. At scale: the
    seed pick is a distributed top-``num_cells`` (TakeOrdered), the
    assignment one broadcast of ``num_cells`` centroids.
    """
    if deterministic:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("_cv")
        )
        seeds = (
            c.withColumn("_h", F.md5(F.col("neighbor_id").cast("string")))
            .orderBy("_h", "neighbor_id")
            .limit(num_cells)
        )
        # window over at most num_cells rows (post-limit): bounded
        cent_df = seeds.withColumn(
            "_cell",
            F.row_number().over(Window.orderBy("_h", "neighbor_id")) - 1,
        ).select("_cell", F.col("_cv").alias("_centroid"))
        aw = Window.partitionBy("neighbor_id").orderBy(
            F.desc("_asim"), F.asc("_cell")
        )
        assigned = (
            c.crossJoin(F.broadcast(cent_df))
            .withColumn("_asim", _dot(F.col("_cv"), F.col("_centroid")))
            .withColumn("_arank", F.row_number().over(aw))
            .filter(F.col("_arank") == 1)
            .select("neighbor_id", "_cv", "_cell")
        )
        return assigned, cent_df

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("_cv")
    ).withColumn("_feat", array_to_vector(F.col("_cv")))
    km = KMeans(k=num_cells, seed=seed, featuresCol="_feat", predictionCol="_cell")
    model = km.fit(c)
    assigned = model.transform(c).select("neighbor_id", "_cv", "_cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)], ["_cell", "_centroid"]
    )
    return assigned, cent_df


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a prebuilt IVF index (from :func:`build_ivf_index`, or the
    same two DataFrames read back from parquet). Output schema matches
    ``brute_force_topk``: DF[query_id, neighbor_id, rank].

    Per query: rank the broadcast centroid table, keep the ``nprobe``
    closest cells, join only those cells' inverted lists, exact-rerank.
    The corpus-sized join is cell-pruned; when ``assigned`` is stored
    partitioned by ``_cell``, partition pruning keeps the scan to the
    probed cells.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("_qv")
    )
    return _ivf_probe_and_rerank(assigned, centroids, q, k, nprobe)


def _ivf_probe_and_rerank(
    assigned: DataFrame,
    cent_df: DataFrame,
    q: DataFrame,
    k: int,
    nprobe: int,
) -> DataFrame:
    # pick nprobe closest centroids per query (broadcast: num_cells rows)
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.asc("_cell"))
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_csim", cosine_similarity(F.col("_qv"), F.col("_centroid")))
        .withColumn("_probe_rank", F.row_number().over(probe_w))
        .filter(F.col("_probe_rank") <= nprobe)
        .select("query_id", "_qv", "_cell")
    )
    scored = (
        probes.join(assigned, on="_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", _dot(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    deterministic: bool = False,
) -> DataFrame:
    """IVF two-stage ANN: KMeans coarse cells + exact rerank in the
    ``nprobe`` closest cells. Output schema matches ``brute_force_topk``.

    One-call composition of :func:`build_ivf_index` +
    :func:`ivf_search`; split the calls (and persist the index) to
    amortize the build across query batches. ``deterministic=True``
    uses the hash-seeded medoid quantizer (see :func:`build_ivf_index`).
    """
    assigned, cent_df = build_ivf_index(
        corpus, num_cells, id_col, vec_col, seed, deterministic
    )
    return ivf_search(assigned, cent_df, queries, k, nprobe, id_col, vec_col)


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization — DF[<id>, qvec: array<int>,
    scale: double].

    Per-vector absmax scaling: ``scale = absmax/127`` and
    ``qvec[i] = round(v[i] * 127 / absmax)`` ∈ [-127, 127], the standard
    storage/ANN-memory reduction (4 bytes → 1 per dimension before
    columnar encoding; dequantize as ``qvec[i] * scale``). All-zero
    vectors quantize to zeros with scale 0. Pure higher-order column
    functions — codegen-resident, no shuffle, no UDF; at 100 TB this is
    a scan-speed rewrite whose output parquet is ~4x smaller."""
    v = _as_double(F.col(vec_col))
    absmax = F.array_max(F.transform(v, F.abs))
    qvec = F.when(
        absmax > 0,
        F.transform(v, lambda x: F.round(x * F.lit(127.0) / absmax).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col), qvec.alias("qvec"), scale.alias("scale")
    )
