"""Corpus-level analysis operators for LLM data pipelines
(SURVEY.md §2.11, tier X — no reference site; these are the
reporting / hygiene passes a 100 TB training-data pipeline runs
between dedup and packing).

All operators are pure JVM-codegen DataFrame compositions (split /
regexp / HOFs) — zero Python in the hot path — so they execute at
scan speed and every one carries a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_samples_spark.llmops.dedup import _shingles
from flink_samples_spark.operators import global_topk
from flink_samples_spark.utils import parallelize_narrow

# Common-subset regexes (Java regex ∩ RE2 semantics identical):
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PHONE_RE = "\\+?[0-9][0-9() -]{6,}[0-9]"
NUMBER_RE = "[0-9]+"


def ngram_topk(docs: DataFrame, k: int = 3, top: int = 20) -> DataFrame:
    """Corpus-wide top-``top`` word ``k``-grams by total occurrence
    count (every occurrence counts — boilerplate detection needs raw
    frequency, not per-doc presence).

    Scale: the k-gram expansion is JVM HOFs over the scan (narrow);
    the count is ONE two-phase aggregation on the shingle — partial
    counts combine map-side so the shuffle carries (shingle, count)
    not raw occurrences; top-k is TakeOrderedAndProject, never a
    global sort. Ties broken by shingle text for determinism.
    """
    # docs shorter than k words contribute NO grams (short_docs=
    # "drop"): a full-text pseudo-k-gram from a frequent one-liner
    # would pollute a frequency report with non-k-grams
    occurrences = _shingles(
        parallelize_narrow(docs), k, short_docs="drop", distinct=False
    ).select("shingle")
    counts = occurrences.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_occ"))
    return global_topk(counts, [F.col("n_occ").desc(), F.col("shingle")], top)


def contamination_check(
    train: DataFrame, eval_docs: DataFrame, k: int = 3
) -> DataFrame:
    """Per-training-document eval-set contamination: the fraction of
    the doc's distinct word ``k``-grams that appear anywhere in the
    eval corpus.

    Output: (doc_id, n_shingles, n_overlap, overlap_ratio) — ratio is
    a division of exact integers, so it is engine-stable.

    Scale: eval shingle sets are small by construction (eval sets
    are curated); AQE broadcasts the distinct eval shingle list at
    runtime when it fits the threshold, so the train side never
    shuffles — and an eval corpus too large to broadcast degrades to
    one hash shuffle on the shingle WITHOUT driver OOM, which a
    forced ``F.broadcast`` hint (honored regardless of size) would
    not. Docs shorter than k words match by their full text
    (``_shingles`` truncate mode — the published truncated-document
    decontamination rule). The
    string shingle keeps the op oracle-checkable; swap in
    ``_shingle_hashes`` to shuffle 8-byte hashes at the full 100 TB
    path.

    Caching contract: the train-side shingle expansion is
    ``.cache()``d because it feeds both the per-doc count and the
    overlap branch; entries persist for the session (LRU-evicted
    under pressure). Long-lived sessions making repeated calls should
    ``spark.catalog.clearCache()`` between them (bench.py does).
    """
    # parallelized + cached: the shingle expansion feeds both the
    # per-doc count and the overlap branch, and a single-file scan
    # would otherwise expand on one core
    train_sh = _shingles(parallelize_narrow(train), k).cache()
    eval_sh = _shingles(eval_docs, k).select("shingle").distinct()
    per_doc = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        per_doc.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_shingles"), 6
            ).alias("overlap_ratio"),
        )
    )


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII indicator counts over ``text_col``: email-
    shaped tokens, phone-shaped digit runs, raw digit runs, and a
    boolean flag. Counting (not extraction) keeps the output small
    and the pass redaction-planning-ready.

    Scale: three regexp_count expressions in one narrow projection —
    whole-stage-codegen at scan speed, nothing shuffles. The regexes
    are written in the Java-regex ∩ RE2 common subset so external
    engines (and the DuckDB oracle) count identically.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    n_numbers = F.regexp_count(t, F.lit(NUMBER_RE))
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_numbers.alias("n_numbers"),
        ((n_emails > 0) | (n_phones > 0)).alias("has_pii"),
    )


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redaction APPLY over ``text_col``: email-shaped tokens →
    ``<EMAIL>``, then phone-shaped digit runs → ``<PHONE>`` — the
    actionable step after :func:`pii_scan`, same detect→APPLY pattern
    as dedup/decontamination. Emits the redacted text's md5 + length
    and a residual email count (must be 0 — an in-plan invariant)
    instead of shipping megabytes of text through the check.

    Scale: two regexp_replace calls fused into one narrow codegen
    projection — scan speed, nothing shuffles. Same Java∩RE2 regex
    subset as pii_scan, so external engines redact identically.
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("bigint").alias("n_chars_redacted"),
        F.regexp_count(red, F.lit(EMAIL_RE)).alias("emails_left"),
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """Per (source, lang) corpus composition report: doc count, total
    whitespace tokens, mean doc length, and how many docs pass the
    length gate — the dashboard aggregate a curation pipeline emits
    per snapshot.

    Scale: one two-phase aggregation; token counts are computed from
    split() sizes map-side, so the shuffle carries ~|sources×langs|
    partial rows.
    """
    n_words = F.size(F.split(F.col("text"), " "))
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_words.cast("long")).alias("total_words"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.sum(
            F.when(F.length("text").between(100, 20000), 1).otherwise(0)
        ).alias("n_len_ok"),
    )


def domain_cap(docs: DataFrame, cap: int = 20, key: str = "source") -> DataFrame:
    """Cap the number of documents kept per domain/source — the
    standard guard against a single crawl host dominating the corpus.
    Selection is deterministic: docs are ranked inside each domain by
    md5(doc_id) (an engine-stable uniform order, i.e. a seeded random
    sample), ties broken by doc_id.

    Scale: rank-filter per group — one shuffle on the domain key; the
    per-group sort touches only (doc_id, key) pairs, and skewed
    domains cost sort-of-group-size, not memory, since only ``cap``
    rows survive. Payload columns rejoin AFTER the cap (callers keep
    doc_id), so wide text never enters the shuffle.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)
    )


def temperature_weights(
    docs: DataFrame, alpha: float = 0.7, key: str = "source"
) -> DataFrame:
    """Temperature-based corpus mixing weights: each domain's sampling
    weight is proportional to (its doc share)^alpha — alpha=1 is
    natural sampling, alpha->0 uniform; 0.7 is the multilingual
    up-weighting convention. Output: (key, n_docs, mix_weight).

    Scale: one two-phase count per domain (tiny result — |domains|
    rows), then a broadcast of the single-row denominator; the raw
    corpus is touched exactly once.
    """
    counts = docs.groupBy(key).agg(F.count(F.lit(1)).alias("n_docs"))
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    denom = counts.agg(F.sum(pw).alias("denom"))
    return counts.crossJoin(F.broadcast(denom)).select(
        key,
        "n_docs",
        F.round(pw / F.col("denom"), 6).alias("mix_weight"),
    )


def boilerplate_score(docs: DataFrame, k: int = 5, df_threshold: int = 3) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's
    distinct word ``k``-grams that appear in more than ``df_threshold``
    documents corpus-wide — the C4/Gopher-style document-frequency
    filter that strips template/boilerplate-heavy docs before training.

    Output: (doc_id, n_shingles, n_common, common_frac).

    Scale: shingle text never reaches a shuffle — each exploded gram
    is xxhash64'd in the SAME codegen stage as the explode (a plain
    function call, unlike the interpreted nested-lambda hash kernel in
    _shingle_hashes, which measured 20× slower here), so document
    frequency is ONE two-phase count on the 8-byte hash (map-side
    combine, the shuffle carries (hash, df) pairs); the join back is
    an equi-join on the hash, then a per-doc two-phase aggregate. No
    Python, no all-pairs comparison — cost is bounded by the corpus's
    shingle mass, same as the tokenizer pass. Counts equal the
    string-shingle counts modulo 2⁻⁶⁴ hash collisions.

    Caching contract: the hashed-shingle expansion is ``.cache()``d
    because it feeds BOTH the document-frequency count and the join
    back; entries persist for the session (LRU-evicted under
    pressure). Long-lived sessions making repeated calls should
    ``spark.catalog.clearCache()`` between them (bench.py does).
    """
    # parallelize_narrow: a single-file corpus scan collapses to one
    # partition and would shingle on one core; cached: feeds BOTH the
    # df-count aggregation and the join back
    sh = (
        _shingles(parallelize_narrow(docs), k)
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .cache()
    )
    df_counts = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    flagged = sh.join(df_counts, "shingle").select(
        "doc_id", (F.col("df") > df_threshold).cast("int").alias("is_common")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum("is_common").cast("bigint").alias("n_common"),
        F.round(F.sum("is_common") / F.count(F.lit(1)), 6).alias("common_frac"),
    )
