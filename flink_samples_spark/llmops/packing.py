"""Sequence packing and corpus mixing — training-data batch shaping
(SURVEY.md §2.11 tier X).

Two operators every large-scale LLM training pipeline needs after
filtering/dedup:

- :func:`pack_sequences` — greedy first-fit packing of documents into
  fixed token-budget training sequences (minimizes padding waste).
  Packing is inherently sequential WITHIN a sequence stream, so the
  corpus is sharded (documents are exchangeable); each shard packs
  independently and in parallel, and determinism comes from packing in
  ``doc_id`` order within a shard. One shuffle on ``shard``; the
  pandas stage holds one shard at a time (≈|corpus|/n_shards rows —
  size ``n_shards`` so a shard's (doc_id, n_tokens) pairs fit an
  executor: 100 TB of docs ≈ 10¹⁰ rows → 100k shards ≈ 100k-row
  shards; the TEXT never enters the stage, only token counts).
- :func:`corpus_mix_key` — weighted-interleave schedule across
  categories (curriculum mixing): category c with weight w contributes
  its rn-th document at position (rn - ½)/w, so a weight-2 category
  appears twice as often in the merged order. Pure window arithmetic,
  one shuffle per category window, NO global coordination: consumers
  range-partition by ``mix_key`` to materialize the order at scale
  (a global row_number would serialize on one partition).
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document to a training pack of ≤ ``budget`` tokens
    (whitespace tokens; oversized docs get a pack of their own).

    Returns (doc_id, shard, pack_id, n_tokens): pack ``(shard,
    pack_id)`` holds consecutive-by-doc_id docs whose token counts sum
    to ≤ budget under greedy first-fit. Deterministic: a pure function
    of (doc_id, n_tokens, budget, n_shards), independent of
    partitioning.

    NULL text is dropped (same convention as
    :func:`~flink_samples_spark.llmops.chunking.chunk_documents`, and
    mirrored in the oracle): a NULL token count would otherwise turn
    the greedy accumulator into NaN inside the pandas stage, after
    which every ``acc + t > budget`` test is False and the REST OF THE
    SHARD silently lands in one unbounded pack.
    """
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        # ANSI-safe: doc_id is non-negative, plain % == pmod here and
        # matches the oracle's modulo
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )

    bdg = budget

    def pack_shard(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE shard arrives as MULTIPLE Arrow batches (~10k rows each
        # under spark.sql.execution.arrow.maxRecordsPerBatch): the
        # sort and the greedy accumulator are shard-global state, so
        # the batches MUST be concatenated first — per-batch packing
        # restarts pack_id mid-shard and silently triples the token
        # budget (verified at 25k one-token docs). Memory is one
        # shard's (doc_id, shard, n_tokens) rows — the narrow frame,
        # not the documents; size n_shards so a shard's row count
        # fits comfortably (the docstring's ~100k rows ≈ 2 MB).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        packs = []
        acc = 0
        pack = 0
        first = True
        for t in pdf["n_tokens"]:
            if not first and acc + t > bdg:
                pack += 1
                acc = t
            else:
                acc += t
            first = False
            packs.append(pack)
        pdf = pdf.assign(pack_id=pd.Series(packs, dtype="int64"))
        yield pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return toks.groupBy("shard").applyInPandas(
        pack_shard, "doc_id bigint, shard int, pack_id bigint, n_tokens int"
    )


def corpus_mix_key(
    docs: DataFrame,
    category_col: str = "lang",
    weights: Mapping[str, float] | None = None,
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted-interleave position for each document: sort the output
    by (mix_key, category, doc_id) and categories appear in proportion
    to their weights, each internally in doc_id order.

    Returns (doc_id, <category_col>, rn, mix_key). mix_key =
    (rn - 0.5) / weight(category) — the classic fractional-position
    interleave; ties across equal-weight categories are broken by the
    (category, doc_id) sort suffix. Rounded to 6 dp (exact in IEEE
    double on both engines for these operand magnitudes, rounding
    pinned anyway for cross-engine hashing).
    """
    bad = {c: w for c, w in (weights or {}).items() if w <= 0}
    if bad or default_weight <= 0:
        raise ValueError(
            f"corpus_mix_key: weights must be > 0 (got {bad or {}}, "
            f"default_weight={default_weight}); a zero weight divides "
            "by zero under ANSI mode and a negative one reverses that "
            "category's order — drop the category upstream instead"
        )
    w = F.lit(float(default_weight))
    if weights:
        expr = None
        for cat, wt in sorted(weights.items()):
            cond = F.col(category_col) == cat
            expr = F.when(cond, float(wt)) if expr is None else expr.when(cond, float(wt))
        w = expr.otherwise(float(default_weight))
    rn = F.row_number().over(
        Window.partitionBy(category_col).orderBy("doc_id")
    )
    out = docs.select("doc_id", category_col).withColumn("rn", rn)
    return out.withColumn(
        "mix_key", F.round((F.col("rn") - 0.5) / w, 6)
    )
