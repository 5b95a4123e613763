"""Document chunking for LLM training pipelines (SURVEY.md §2.11
tier X — no reference site; context-window shaping is the step between
corpus curation and sequence packing).

Splits each document's word sequence into fixed-size overlapping
windows — the standard pre-tokenization step that turns arbitrary-length
documents into model-context-sized training rows. Entirely JVM
built-ins (split / sequence / slice / posexplode inside whole-stage
codegen): a narrow per-row map with no shuffle, so at 100 TB it runs at
scan speed and the output can flow straight into
:mod:`flink_samples_spark.llmops.packing`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame, chunk_words: int = 32, stride: int = 24
) -> DataFrame:
    """Overlapping word-window chunks per document.

    Window ``i`` starts at word ``1 + i*stride``; the number of windows
    is ``ceil(max(n - chunk_words, 0) / stride) + 1``, so every word is
    covered, consecutive chunks overlap by ``chunk_words - stride``
    words, and the final chunk is never shorter than
    ``chunk_words - stride + 1`` words (no degenerate tail chunks).
    A document shorter than ``chunk_words`` yields exactly one chunk.

    Output: (doc_id, chunk_idx, chunk_text, n_chunk_words) — a pure
    function of the input text, reproducible across engines (the DuckDB
    oracle mirrors the same start arithmetic).

    Scale: narrow map, no shuffle, no Python; output row count is
    ~``n_words/stride`` per document, bounded by the tokenizer pass.
    """
    if stride <= 0 or chunk_words <= 0 or stride > chunk_words:
        raise ValueError("require 0 < stride <= chunk_words")
    # NULL text is dropped (mirrored in the oracle): greatest/least
    # skip NULLs, so a NULL-text row would otherwise fabricate one
    # phantom chunk claiming n_chunk_words == chunk_words with NULL
    # text. Tokenization convention (repo-wide, oracles included):
    # words are a single-space split, so runs of spaces produce empty
    # tokens that count as words — normalize whitespace upstream
    # (e.g. the fingerprint normalization) when that matters.
    docs = docs.filter(F.col("text").isNotNull())
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    # last start = 1 + stride * ceil(max(n - chunk, 0) / stride)
    last = F.lit(1) + F.lit(stride) * F.ceil(
        F.greatest(n - F.lit(chunk_words), F.lit(0)) / F.lit(float(stride))
    ).cast("int")
    base = docs.select(
        "doc_id",
        words.alias("ws"),
        n.alias("n"),
        F.sequence(F.lit(1), last, F.lit(stride)).alias("starts"),
    )
    return base.select(
        "doc_id",
        F.posexplode("starts").alias("chunk_idx", "s"),
        F.col("n"),
        F.col("ws"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(F.slice(F.col("ws"), F.col("s"), chunk_words), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_words), F.col("n") - F.col("s") + 1)
        .cast("bigint")
        .alias("n_chunk_words"),
    )


def chunk_oracle_sql(
    chunk_words: int = 32, stride: int = 24, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`chunk_documents` — generated from the same
    parameters (and validated identically) so the two cannot drift.
    ``relation`` may be a table name or a CTE defined by the caller
    (any (doc_id, text) relation)."""
    if stride <= 0 or chunk_words <= 0 or stride > chunk_words:
        raise ValueError("require 0 < stride <= chunk_words")
    c, s = int(chunk_words), int(stride)
    return f"""
    WITH w AS (
      SELECT doc_id, str_split(text, ' ') AS ws, len(str_split(text, ' ')) AS n
      FROM {relation}
      WHERE text IS NOT NULL
    ), st AS (
      SELECT doc_id, ws, n,
             unnest(range(1,
               CAST(2 + {s} * CEIL(GREATEST(n - {c}, 0) / CAST({s} AS DOUBLE)) AS BIGINT),
               {s})) AS strt
      FROM w
    )
    SELECT doc_id,
           CAST((strt - 1) / {s} AS BIGINT) AS chunk_idx,
           array_to_string(ws[CAST(strt AS BIGINT):CAST(strt + {c} - 1 AS BIGINT)], ' ')
             AS chunk_text,
           CAST(LEAST({c}, n - strt + 1) AS BIGINT) AS n_chunk_words
    FROM st
    """
