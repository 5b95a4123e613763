from flink_samples_spark.llmops.chunking import chunk_documents
from flink_samples_spark.llmops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_lsh_pairs_cross,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from flink_samples_spark.llmops.similarity import (
    brute_force_cosine_topk,
    cosine_pairs,
    ivf_cosine_topk,
    lsh_bucketed_topk,
    quantize_int8,
)
from flink_samples_spark.llmops.text import (
    document_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_counts,
)

__all__ = [
    "brute_force_cosine_topk",
    "chunk_documents",
    "cosine_pairs",
    "document_fingerprint",
    "exact_dedup",
    "ivf_cosine_topk",
    "language_id",
    "lsh_bucketed_topk",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_cross",
    "ngram_jaccard_pairs",
    "quality_score",
    "quantize_int8",
    "simhash_signatures",
    "text_stats",
    "token_counts",
]
