"""LLM-training-data pipeline operators: text analysis, deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force, hyperplane-LSH, IVF), and multimodal
binary columns. See module docstrings for the 100 TB posture of each."""

from graphframes_spark.datapipe.dedup import (
    cosine_similarity,
    banded_hyperplane_sketches,
    embedding_cosine_pairs,
    embedding_dedup,
    exact_dedup,
    jaccard,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash48,
    simhash_pairs,
)
from graphframes_spark.datapipe.multimodal import (
    binary_metadata,
    extract_features,
    fake_decoder,
    with_binary,
)
from graphframes_spark.datapipe.similarity import (
    brute_force_topk,
    hyperplane_sketch,
    ivf_topk,
    lsh_topk,
)
from graphframes_spark.datapipe.sampling import (
    balanced_sample,
    sample_rank,
    source_rollup,
)
from graphframes_spark.datapipe.streaming import (
    sessionize_batch,
    stream_exact_dedup,
    stream_near_dup_candidates,
    stream_sessionize,
    stream_token_stats,
)
from graphframes_spark.datapipe.text import (
    ngram_overlap,
    ngrams,
    repetition_stats,
    fingerprint,
    language_id,
    minhash_fingerprint,
    shingles,
    token_count,
    token_count_bpe,
    tokenize,
    with_quality_scores,
)

__all__ = [
    "balanced_sample",
    "brute_force_topk",
    "binary_metadata",
    "cosine_similarity",
    "banded_hyperplane_sketches",
    "embedding_cosine_pairs",
    "embedding_dedup",
    "exact_dedup",
    "extract_features",
    "fake_decoder",
    "fingerprint",
    "hyperplane_sketch",
    "ivf_topk",
    "jaccard",
    "language_id",
    "lsh_candidate_pairs",
    "lsh_topk",
    "minhash_fingerprint",
    "ngram_overlap",
    "ngrams",
    "repetition_stats",
    "sample_rank",
    "sessionize_batch",
    "source_rollup",
    "stream_exact_dedup",
    "stream_near_dup_candidates",
    "stream_sessionize",
    "stream_token_stats",
    "minhash_lsh_dedup",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash48",
    "simhash_pairs",
    "token_count",
    "token_count_bpe",
    "tokenize",
    "with_binary",
    "with_quality_scores",
]
