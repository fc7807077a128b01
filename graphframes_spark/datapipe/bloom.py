"""Broadcast Bloom-filter prefilters for cross-corpus decontamination.

Beyond-reference (the reference has no corpus operators at all): this is
the runtime-filter pattern Spark itself uses for row-level join pruning
(InjectRuntimeFilter's `bloom_filter_agg`/`might_contain`), made explicit
and composable for the train/benchmark decontamination step of an LLM
data pipeline:

1. **Build** a compact bit array from the *small* side (the benchmark
   set's distinct n-gram shingles): k = ``num_hashes`` positions per
   shingle via seeded ``xxhash64 mod num_bits``, OR-ed into packed
   64-bit words with one ``bit_or`` hash aggregation. The driver holds
   only ``num_bits/8`` bytes (default 1 MiB at 2^23 bits) — bounded,
   scale-independent of the corpus being filtered.
2. **Prefilter** the *huge* side: explode each document's distinct
   shingles and keep only those whose k bits are all set — a pure
   per-row ``getbit`` check against the broadcast word array, evaluated
   at scan speed inside codegen before any shuffle. False positives
   pass, false negatives are impossible.
3. **Exact verify** the survivors with the inverted-index equi-join of
   :func:`~graphframes_spark.datapipe.text.ngram_overlap`. The bloom
   stage only shrinks the join's build input, so the final answer is
   bit-identical to the un-prefiltered exact join — which is what makes
   the whole operator DuckDB-oracle-able despite the probabilistic
   middle.

100 TB posture: the exact inverted-index join shuffles every (shingle,
doc) pair of BOTH corpora; with a 100 TB train corpus against a few-GB
benchmark set, >99.9% of exploded train shingles match nothing and are
pure shuffle waste. The bloom prefilter drops them executor-side before
the exchange, turning the join's left input from corpus-sized to
contamination-sized. Size ``num_bits`` to ~10 bits per distinct
benchmark shingle for ~1% FP (2^33 bits = 1 GiB still broadcasts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.datapipe.text import shingles, tokenize
from graphframes_spark.util import GraphFramesError

_WORD_BITS = 64


@dataclass(frozen=True)
class BloomFilter:
    """Immutable packed-bitset Bloom filter (``num_bits`` must be a
    multiple of 64; ``words`` has ``num_bits // 64`` entries)."""

    num_bits: int
    num_hashes: int
    words: tuple[int, ...]

    def __post_init__(self) -> None:
        if len(self.words) != self.num_bits // _WORD_BITS:
            raise GraphFramesError(
                f"BloomFilter with num_bits={self.num_bits} needs "
                f"{self.num_bits // _WORD_BITS} words, got {len(self.words)}"
            )


def _positions(value: Column, num_hashes: int, num_bits: int) -> Column:
    """array<bigint> of the k bit positions for one hashed value."""
    return F.array(
        *[
            F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(num_bits))
            for seed in range(num_hashes)
        ]
    )


def build_bloom(
    values: DataFrame,
    value_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> BloomFilter:
    """Build a :class:`BloomFilter` over a DataFrame column.

    One explode + one ``bit_or`` hash aggregation (partial-aggregatable:
    each executor ORs its local masks before the single small shuffle),
    then a bounded ``num_bits/64``-row collect. Null values are ignored.
    """
    if num_bits < _WORD_BITS or num_bits % _WORD_BITS:
        raise GraphFramesError(
            f"num_bits must be a positive multiple of 64, got {num_bits}"
        )
    if num_hashes < 1:
        raise GraphFramesError(f"num_hashes must be >= 1, got {num_hashes}")
    masks = (
        values.select(
            F.explode(
                _positions(F.col(value_col), num_hashes, num_bits)
            ).alias("_p")
        )
        .select(
            F.shiftright(F.col("_p"), 6).alias("_w"),
            F.col("_p").bitwiseAND(F.lit(63)).alias("_b"),
        )
        .select(
            "_w",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_b AS INT))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_mask"))
        .collect()
    )
    words = [0] * (num_bits // _WORD_BITS)
    for row in masks:
        words[row["_w"]] = row["_mask"]
    return BloomFilter(num_bits, num_hashes, tuple(words))


def might_contain(bloom_words: Column, value: Column, bloom: BloomFilter) -> Column:
    """Boolean: all k bits for ``value`` are set in the packed word array
    ``bloom_words`` (an ``array<bigint>`` column, 1-indexed via
    ``element_at``). Never false for a value the filter was built on."""
    cond = F.lit(True)
    for seed in range(bloom.num_hashes):
        p = F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(bloom.num_bits))
        word = F.element_at(bloom_words, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        cond = cond & (F.getbit(word, p.bitwiseAND(F.lit(63))) == F.lit(1))
    return cond


def attach_bloom(df: DataFrame, bloom: BloomFilter, col_name: str = "_bloom") -> DataFrame:
    """Cross-join the 1-row broadcast word array onto ``df`` (the same
    scalar-broadcast shape the repo's tfidf/sampling operators use; AQE
    plans it as a broadcast nested-loop join over one row)."""
    spark = df.sparkSession
    bw = spark.createDataFrame(
        [(list(bloom.words),)], f"{col_name} array<bigint>"
    )
    return df.crossJoin(F.broadcast(bw))


def decontaminate(
    df: DataFrame,
    ref: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: Optional[str] = None,
    ref_text_col: Optional[str] = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    bloom: Optional[BloomFilter] = None,
) -> DataFrame:
    """Drop every ``df`` document sharing >= ``min_shared`` distinct
    n-gram shingles with any ``ref`` document (other than itself, for
    overlapping corpora) — the benchmark-decontamination pass, returned
    with ``df``'s full schema.

    Exactly equivalent to an anti-join against
    :func:`~graphframes_spark.datapipe.text.ngram_overlap`'s contaminated
    set: the Bloom stage (built on ``ref``'s shingles, checked on
    ``df``'s before the shuffle) only removes shingles that provably
    cannot match, and surviving false positives die in the exact
    equi-join. Pass a prebuilt ``bloom`` to amortize the build across
    incremental corpus batches.
    """
    if min_shared < 1:
        raise GraphFramesError(f"min_shared must be >= 1, got {min_shared}")
    ref_id_col = ref_id_col or id_col
    ref_text_col = ref_text_col or text_col
    ref_sh = ref.select(
        F.col(ref_id_col).alias("_ref_id"),
        F.explode(shingles(tokenize(F.col(ref_text_col)), n)).alias("_sh"),
    )
    if bloom is None:
        bloom = build_bloom(
            ref_sh.select("_sh").distinct(), "_sh", num_bits, num_hashes
        )
    left = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(tokenize(F.col(text_col)), n)).alias("_sh"),
    )
    survivors_sh = attach_bloom(left, bloom).filter(
        might_contain(F.col("_bloom"), F.col("_sh"), bloom)
    )
    contaminated = (
        survivors_sh.join(ref_sh, on="_sh")
        .filter(F.col("_id") != F.col("_ref_id"))
        .groupBy("_id", "_ref_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= F.lit(min_shared))
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return df.join(contaminated, on=id_col, how="left_anti")
