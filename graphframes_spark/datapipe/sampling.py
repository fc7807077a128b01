"""Deterministic sampling and corpus rollups for training-data mixes.

Beyond-reference operators (the reference has no data-pipeline tier):
building a training mix from a 100 TB corpus needs (a) a *deterministic*,
re-runnable sampler that balances over a stratification key (language,
source, quality bucket) and (b) per-source health rollups (volume,
quality, duplication) to decide the mix weights in the first place.

Scale posture:

- ``balanced_sample`` is a two-level tournament top-n-per-group: a local
  round over ``(group, salt)`` cells bounds every window partition at
  ``|group| / salt`` rows, then a final round ranks only the ~``salt*n``
  per-group survivors. The result is EXACTLY the n smallest
  ``(rank, key)`` rows per group for any ``salt >= 1`` (each salt cell's
  local top-n is a superset of that cell's contribution to the global
  top-n), so a hot group — English at 60% of a web corpus — never lands
  in a single window partition. Ranks are ``md5(seed || key)``: uniform,
  engine-portable (DuckDB oracle reproduces them bit-for-bit), and stable
  across reruns — resuming a failed ingestion re-selects the same rows.
- ``source_rollup`` is one hash-aggregate shuffle with map-side partial
  aggregation; the only non-partial piece is the exact distinct-
  fingerprint count (Spark plans it as a two-phase expand). Pass
  ``exact_distinct=False`` to swap in ``approx_count_distinct`` (HLL,
  fully partial-aggregatable) when the rollup feeds dashboards rather
  than oracles.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphframes_spark.datapipe.text import fingerprint, quality_scores

#: unit separator — joins seed and key without ambiguity ("a"+"bc" vs "ab"+"c")
_SEP = "\x1f"


def sample_rank(key: Column, seed: str = "") -> Column:
    """Deterministic uniform rank in hex: ``md5(seed <US> key)``.

    md5 rather than ``xxhash64`` so an external system (or the DuckDB
    oracle: ``md5(concat_ws(chr(31), seed, CAST(key AS VARCHAR)))``) can
    reproduce the selection bit-for-bit; changing ``seed`` draws an
    independent sample."""
    return F.md5(F.concat_ws(_SEP, F.lit(seed), key.cast("string")))


def sample_keep(key: Column, fraction: float, seed: str = "") -> Column:
    """Boolean: deterministically keep ~``fraction`` of rows by key.

    The md5 hex rank is uniform over [0, 16^32); lexicographic order on
    lowercase hex IS numeric order, so ``rank < hex(fraction * 16^32)``
    selects the fraction exactly — one string comparison, no hex→int
    conversion, and the DuckDB oracle replicates it with the same two
    builtins. Same seed → same rows on every run and every engine."""
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    threshold = format(int(fraction * 16**32), "032x")
    return sample_rank(key, seed) < F.lit(threshold)


def balanced_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    seed: str = "",
    salt: Optional[int] = 16,
) -> DataFrame:
    """Exactly ``n_per_group`` rows per ``group_col`` value (fewer when the
    group is smaller), chosen as the ``n`` smallest ``(sample_rank, key)``
    per group — a deterministic uniform draw without replacement.

    ``salt`` (default 16; ``None``/``<=1`` disables) is the tournament
    width: the local round partitions each group into ``salt`` cells by
    ``xxhash64(key)``, keeps the local top-n per cell, and only the
    survivors reach the per-group final window. The salt changes the
    execution plan, never the selected rows. Size it near the cluster's
    parallelism for skewed group keys (a handful of giant languages);
    ``salt=None`` saves the extra shuffle when groups are known-small.
    """
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    key = F.col(key_col)
    work = df.withColumn("_bs_rank", sample_rank(key, seed))
    if salt is not None and salt > 1:
        local = Window.partitionBy(group_col, "_bs_salt").orderBy("_bs_rank", key_col)
        work = (
            work.withColumn("_bs_salt", F.pmod(F.xxhash64(key), F.lit(salt)))
            .withColumn("_bs_rn", F.row_number().over(local))
            .filter(F.col("_bs_rn") <= n_per_group)
            .drop("_bs_salt", "_bs_rn")
        )
    final = Window.partitionBy(group_col).orderBy("_bs_rank", key_col)
    return (
        work.withColumn("_bs_rn", F.row_number().over(final))
        .filter(F.col("_bs_rn") <= n_per_group)
        .drop("_bs_rank", "_bs_rn")
    )


def source_rollup(
    df: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-group corpus health: ``n_docs``, ``avg_tokens``, ``keep_rate``
    (fraction passing the Gopher-style quality heuristic), ``n_unique``
    exact-content fingerprints, and ``dup_rate`` = 1 - unique/docs.

    One shuffle on the (low-cardinality) group key; per-row quality
    signals stay inside whole-stage codegen. ``exact_distinct=False``
    trades the exact two-phase distinct count for a single-pass HLL
    sketch — the right call at 100 TB when +-2% on dup_rate is fine."""
    q = quality_scores(F.col(text_col))
    rows = df.select(
        *group_cols,
        q["n_tokens"].alias("_sr_tokens"),
        q["keep"].cast("double").alias("_sr_keep"),
        fingerprint(F.col(text_col)).alias("_sr_fp"),
    )
    n_unique = (
        F.count_distinct(F.col("_sr_fp"))
        if exact_distinct
        else F.approx_count_distinct(F.col("_sr_fp"))
    )
    return (
        rows.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("_sr_tokens").alias("avg_tokens"),
            F.avg("_sr_keep").alias("keep_rate"),
            n_unique.alias("n_unique"),
        )
        .withColumn(
            "dup_rate",
            F.lit(1.0) - F.col("n_unique") / F.col("n_docs").cast("double"),
        )
    )


def corpus_profile(
    df: DataFrame,
    group_cols: Sequence[str] = ("source",),
    text_col: str = "text",
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Per-group size-distribution profile: ``n_docs`` plus exact (or
    sketched) percentiles of the whitespace token count and character
    length — ``tokens_p25 … tokens_p95, chars_p25 … chars_p95``.

    The shape question a mix designer asks before setting context-window
    and chunking policy: "how long are documents from this source,
    really?" — means hide bimodality, percentiles don't.

    ``exact=True`` uses ``percentile`` (interpolated, matches SQL
    ``percentile_cont``/``quantile_cont`` — oracle-checkable);
    ``exact=False`` swaps in ``percentile_approx`` (t-digest sketch,
    fully partial-aggregatable) — the right call at 100 TB where a
    per-group exact percentile must buffer the group's values.
    One hash-aggregate shuffle on the low-cardinality group key either
    way; the token count stays inside whole-stage codegen.
    """
    from graphframes_spark.datapipe.text import token_count

    fn = F.percentile if exact else F.percentile_approx
    rows = df.select(
        *group_cols,
        token_count(F.col(text_col)).cast("double").alias("_cp_tokens"),
        F.length(F.col(text_col)).cast("double").alias("_cp_chars"),
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for p in percentiles:
        tag = f"p{int(round(p * 100)):02d}"
        aggs.append(fn(F.col("_cp_tokens"), F.lit(p)).alias(f"tokens_{tag}"))
    for p in percentiles:
        tag = f"p{int(round(p * 100)):02d}"
        aggs.append(fn(F.col("_cp_chars"), F.lit(p)).alias(f"chars_{tag}"))
    return rows.groupBy(*group_cols).agg(*aggs)


def split_corpus(
    df: DataFrame,
    key_col: str,
    weights: Optional[dict[str, float]] = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment — input columns plus
    ``split: string``.

    ``weights`` maps split name → fraction (default
    ``{"train": .98, "val": .01, "test": .01}``); fractions must sum to
    1. Assignment hashes only ``key_col`` (``sample_rank``: seeded md5,
    engine-reproducible), so it is stable under reruns, repartitioning
    and retries, and adding rows later never moves an existing key
    between splits — the property that keeps eval sets uncontaminated
    as a 100 TB corpus grows. Narrow transform: no shuffle, no UDF.
    """
    from graphframes_spark.util import GraphFramesError

    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or abs(sum(weights.values()) - 1.0) > 1e-9:
        raise GraphFramesError(
            f"split weights must sum to 1, got {weights!r}"
        )
    rank = sample_rank(F.col(key_col), seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        threshold = format(int(cum * 16**32), "032x")
        cond = rank < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def dedup_keep_best(
    df: DataFrame,
    group_col: str,
    quality_col: str,
    key_col: str,
) -> DataFrame:
    """Duplicate-group resolution — input columns plus ``keep: boolean``.

    Within each ``group_col`` value (e.g. an exact-dedup fingerprint or
    a near-dup cluster id) exactly one row is kept: the highest
    ``quality_col``, ties broken by smallest ``key_col`` — the standard
    "keep the best copy" policy after any dedup pass. One
    ``row_number`` window partitioned by group: a single shuffle on the
    group key, skew-bounded by the largest duplicate cluster (AQE
    splits stragglers), never a driver-side collect."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc(quality_col), F.asc(key_col)
    )
    return df.withColumn("keep", F.row_number().over(w) == 1)


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 0.7,
    target_frac: float = 0.5,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Temperature-based mixture sampling over sources — the standard
    training-mix reweighting (multilingual/multi-source LM recipes:
    sample source s proportionally to ``w_s^τ``, τ < 1 flattens the
    mix toward small sources, τ = 1 keeps natural proportions).

    Keeps a deterministic hash-selected subset whose per-source keep
    rates realize the temperature-adjusted mixture at overall size
    ``target_frac * |df|`` (rates are capped at 1.0 — a small source
    whose adjusted share exceeds its size keeps everything; the
    shortfall is NOT rebalanced onto other sources, so the realized
    total can undershoot when τ is extreme — stated contract, no
    silent reflow). Selection is by seeded md5 over ``key_col``, so
    membership is stable as the corpus grows (same key, same verdict)
    and identical across engines.

    DF = input rows that survive, all columns preserved.

    Plan: one small groupBy over sources (broadcast back), then a
    scan-speed hash filter — no global sort, no rand(), no shuffle of
    the data rows themselves. 100 TB posture: the only shuffle is the
    |sources|-row aggregate.
    """
    from graphframes_spark.util import GraphFramesError

    if not 0.0 < temperature:
        raise GraphFramesError(f"temperature must be > 0, got {temperature}")
    if not 0.0 < target_frac <= 1.0:
        raise GraphFramesError(f"target_frac must be in (0, 1], got {target_frac}")

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    adjusted = counts.select(
        source_col,
        "_n",
        F.pow(F.col("_n").cast("double"), F.lit(float(temperature))).alias("_w"),
    )
    total_w = adjusted.agg(
        F.sum("_w").alias("_tw"), F.sum("_n").alias("_tn")
    )
    rates = (
        adjusted.crossJoin(F.broadcast(total_w))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (F.col("_w") / F.col("_tw"))
                * F.lit(float(target_frac))
                * F.col("_tn")
                / F.col("_n"),
            ).alias("_keep_rate"),
        )
    )
    keyed = df.join(F.broadcast(rates), on=source_col, how="inner")
    # hash-unit in [0, 1): first 12 md5 hex chars as an integer over 16^12
    # — column-valued twin of sample_keep (whose threshold is a Python
    # float); DuckDB replays it as ('0x'||substr(md5(..),1,12))::BIGINT
    unit = F.conv(F.substring(sample_rank(F.col(key_col), seed), 1, 12), 16, 10).cast(
        "double"
    ) / F.lit(float(16**12))
    return keyed.filter(unit < F.col("_keep_rate")).drop("_keep_rate")
