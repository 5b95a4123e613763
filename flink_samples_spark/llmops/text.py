"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.11).

All hot paths are JVM-side built-ins (regexp/split/length — inside
whole-stage codegen); the only Python is the language-ID trigram
scorer, which is an Arrow-batched pandas UDF. Every operator is a
narrow map over ``documents`` — no shuffle — so at 100 TB these run
at scan speed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_samples_spark.utils import parallelize_narrow

# BPE-ish tokenizer: letter runs, digit runs, or single non-space
# symbols — the shape GPT-style pre-tokenizers produce. No backslash
# classes: the pattern embeds verbatim in both Spark SQL and DuckDB
# string literals.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny stopword profiles for the heuristic language scorer.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "un"),
    "fr": ("le", "la", "et", "les", "des", "un"),
}


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document word/char stats + per-language rollup inputs."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars_obs"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias(
            "n_spaces"
        ),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count.

    The whitespace count splits the TRIMMED text (Java split keeps a
    leading empty string for whitespace-led input, silently inflating
    the count by one) and defines an all-whitespace/empty document as
    zero tokens. The trim is regex-based with an EXPLICIT whitespace
    class ``[ \\t\\n\\f\\r]`` (SQL ``trim`` strips only SPACES, and the
    engines' ``\\s`` shorthands disagree — Java's includes ``\\x0B``
    vertical tab, RE2's does not — so the shorthand would make a
    VT-edged document count differently under the DuckDB oracle)."""
    _ws = r"[ \t\n\f\r]"
    trimmed = F.regexp_replace(F.col("text"), f"^{_ws}+|{_ws}+$", "")
    n_ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, f"{_ws}+"))
    )
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")).alias("n_bpe_tokens"),
    )


def quality_keep_expr() -> Column:
    """Boolean keep decision over ``text``: length band + English
    stopword-ratio floor. Exposed as an expression so composed
    pipelines fuse it into one projection instead of joining back."""
    n_chars = F.length("text")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in _LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    return (
        (n_chars >= 100)
        & (n_chars <= 20000)
        & (n_stop.cast("double") / n_words >= 0.05)
    )


def fingerprint_expr() -> Column:
    """Canonical-content md5 over lowercased, punctuation-stripped,
    space-normalized, TRIMMED ``text`` (engine-stable; see
    document_fingerprint). The trim matters: stripped leading/trailing
    punctuation leaves edge spaces the interior-run collapse keeps, so
    without it '- Hello' and 'Hello' would fingerprint differently
    despite identical canonical content."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), r" +", " "
    )
    canon = F.trim(normalized)
    # A doc with no [a-z0-9] content (non-Latin text, punctuation-only)
    # canonicalizes to '' — hashing that would give EVERY such doc the
    # same fingerprint and exact-dedup would collapse unrelated
    # documents into one survivor. Fall back to hashing the raw text:
    # identical non-Latin docs still dedup, distinct ones stay distinct.
    # nullif/coalesce instead of when(length==0): `canon` is referenced
    # ONCE, so Catalyst's expression inlining can't duplicate the
    # two-regexp chain into both the condition and the branch (the
    # when-form measured ~1.6× on q_dedup_exact). A NULL text stays
    # NULL through both forms.
    return F.md5(F.coalesce(F.nullif(canon, F.lit("")), F.col("text")))


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: length band, punctuation ratio,
    stopword ratio — the standard pretraining quality filters, all
    codegen'd (no Python)."""
    n_chars = F.length("text")
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[.,;:!?]", "")
    )
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in _LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_obs"),
        # nullif: an empty-text row must yield a NULL ratio, not kill
        # the job with DIVIDE_BY_ZERO under ANSI mode (n_words is
        # never 0 — split('') is [''] — so only n_chars needs it)
        F.round(n_punct.cast("double") / F.nullif(n_chars, F.lit(0)), 6).alias(
            "punct_ratio"
        ),
        F.round(n_stop.cast("double") / n_words, 6).alias("stopword_ratio"),
        quality_keep_expr().cast("int").alias("keep"),
    )


def document_fingerprint(docs: DataFrame) -> DataFrame:
    """Canonical-content fingerprint: md5 over lowercased,
    punctuation-stripped, space-normalized text. Stable across
    engines (md5 is standardized), so exact-dup detection can join on
    it at any scale."""
    return docs.select("doc_id", fingerprint_expr().alias("fingerprint"))


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals, adapted to single-line docs:
    duplicate-word fraction (1 - distinct/total) and the fraction of
    all word bigrams taken by the single most frequent bigram — the
    standard boilerplate/template detectors run before pretraining.

    Output: (doc_id, n_words, dup_word_frac, top_bigram_frac,
    n_bigrams); docs with fewer than two words get frac 0.

    Scale: the bigram expansion is JVM ``zip_with`` over the scan
    (narrow, repartitioned off a single-file collapse); counting is
    two keyed two-phase aggregations — the count key is the exploded
    bigram's xxhash64 (codegen; the shuffles carry (doc_id, hash,
    count) then (doc_id, stats), never raw text) — plus one shuffle
    join back on doc_id; ``base`` is cached because it feeds both the
    expansion and the final join. Nothing exceeds a doc's own token
    count, so at 100 TB this is bounded by the tokenizer pass itself.
    """
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    pair_len = F.greatest(n - 1, F.lit(0))
    base = parallelize_narrow(docs).select(
        "doc_id",
        n.alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(words)) / n.cast("double"), 6
        ).alias("dup_word_frac"),
        F.zip_with(
            F.slice(words, 1, pair_len),
            F.slice(words, 2, pair_len),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ).alias("bigrams"),
    ).cache()
    per_bg = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .select("doc_id", F.xxhash64("bg").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_bg.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    )
    return (
        base.select("doc_id", "n_words", "dup_word_frac")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "dup_word_frac",
            F.round(
                F.coalesce(F.col("top_c"), F.lit(0)).cast("double")
                / F.coalesce(F.col("n_bg"), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
            F.coalesce(F.col("n_bg"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        )
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of stopword-profile hit counts
    (how many of the profile's words occur as space-delimited tokens).
    Deterministic (ties broken by profile order), Arrow-batched, and
    fully vectorized: each profile word is ONE C-level regex pass over
    the batch (``(?:^| )w(?: |\\Z)`` ⟺ token-set membership under the
    same space split), then a column-wise idxmax — no per-row Python.

    Rows-only check by design: the scoring table lives in Python, not
    SQL; tests assert determinism + label coverage instead.
    """
    import re as _re

    profiles = list(_LANG_PROFILES.items())

    def score_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL text must score as 'unk', not TypeError the whole
            # Arrow task (str.contains yields NA on nulls and the
            # int64 cast refuses it)
            low = pdf["text"].fillna("").str.lower()
            per_lang = {}
            for lang, ws in profiles:
                hits = None
                for w in ws:
                    # \Z, not $: Python's $ also matches BEFORE a
                    # trailing newline, which would count 'the\n' as a
                    # hit the space-split token set does not contain
                    b = low.str.contains(
                        f"(?:^| ){_re.escape(w)}(?: |\\Z)", regex=True
                    ).astype("int64")
                    hits = b if hits is None else hits + b
                per_lang[lang] = hits
            scores = pd.DataFrame(per_lang)
            best = scores.idxmax(axis=1)  # first max = profile order
            top = scores.max(axis=1).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang_pred": best.where(top > 0, "unk"),
                    "lang_hits": top,
                }
            )

    return parallelize_narrow(docs).mapInPandas(
        score_batch, "doc_id bigint, lang_pred string, lang_hits bigint"
    )


def tfidf_top_terms(docs: DataFrame, top: int = 3) -> DataFrame:
    """Per-document top-``top`` characteristic terms by tf·(N/df) —
    the raw-ratio idf variant of TF-IDF: ``score = tf * N / df``
    (term frequency × inverse document-frequency ratio, no log
    damping). Chosen over log-idf because the score stays a single
    IEEE division of exact integers — bit-identical across engines
    (``log``/``ln`` is not correctly-rounded and differs between libm
    implementations — a value-hash hazard). Swap the ``score``
    expression for ``tf * log(N/df)`` when log damping matters more
    than cross-engine determinism; the plan shape is unchanged.

    Output: (doc_id, term, tf, df, score) — ``top`` rows per doc,
    ties broken by term text.

    Scale: words explode off the scan into ONE (doc_id, word) count
    (partial→final, the shuffle carries counts, not text streams);
    document frequency reuses THAT aggregate (distinct docs per word
    = one more two-phase count over it, no second corpus pass); the
    join back is an equi-join on the term; the per-doc top-k is a
    rank window partitioned by doc_id — no global sort anywhere.
    """
    tf = (
        parallelize_narrow(docs)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .cache()  # feeds both the df count and the score join
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a broadcast 1-row cross join: stays lazy (no
    # driver-side count during plan construction) and costs one
    # 8-byte replicate instead of a job
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(dfc, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 6
        ).alias("score"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= top)
        .drop("rn")
    )


def build_vocab(docs: DataFrame, size: int = 100) -> DataFrame:
    """Corpus vocabulary: the ``size`` most frequent words, id = rank
    (1-based; ties broken by word text for engine determinism).

    Scale: ONE two-phase count on the word + TakeOrderedAndProject —
    the same shape as ngram_topk; never a global sort.
    """
    from flink_samples_spark.operators import global_topk

    occ = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    counts = occ.groupBy("w").agg(F.count(F.lit(1)).alias("n_occ"))
    top = global_topk(counts, [F.col("n_occ").desc(), F.col("w")], size)
    win = Window.orderBy(F.col("n_occ").desc(), F.col("w"))
    return top.select("w", F.row_number().over(win).alias("token_id"))


# Above this vocab size the literal-map encoding path is replaced by a
# broadcast join: a 32k–100k-entry create_map would inline ~2·size
# literal expressions into ONE projection — a plan-size / codegen
# blow-up on the single operator that advertises "the corpus never
# shuffles to encode".
VOCAB_BROADCAST_THRESHOLD = 1000


def vocab_encode(
    docs: DataFrame, size: int = 100, broadcast_threshold: int = VOCAB_BROADCAST_THRESHOLD
) -> DataFrame:
    """Tokenize + vocab-encode: map each word to its vocabulary id
    (0 = OOV) and emit per-doc encoding stats — the pretokenization →
    id-encoding step before training, with the encoded sequence pinned
    by a position-weighted integer checksum (Σ position·id, exact).

    Scale — two regimes, identical results:

    - ``size <= broadcast_threshold``: the vocab is a
      HYPERPARAMETER-sized table (like k-means centroids), so it
      collects to the driver and ships as a map literal inside one
      narrow codegen'd projection — the corpus never shuffles.
    - ``size > broadcast_threshold`` (real 32k–100k tokenizer
      vocabs): tokens posexplode (narrow) and BROADCAST-hash-join
      the vocab on the word; per-doc stats come back via a two-phase
      aggregate whose map-side combine collapses each doc's tokens
      inside its own scan partition, so the shuffle carries ONE
      partial row per document — never the exploded corpus.

    Vocab build itself is a two-phase count either way.
    """
    if size <= broadcast_threshold:
        vocab = {r["w"]: r["token_id"] for r in build_vocab(docs, size).collect()}
        pairs: list = []
        for w, i in sorted(vocab.items()):
            pairs.extend([F.lit(w), F.lit(i)])
        vmap = F.create_map(*pairs)
        ws = F.split(F.col("text"), " ")
        ids = F.transform(ws, lambda w: F.coalesce(F.element_at(vmap, w), F.lit(0)))
        base = docs.select("doc_id", ids.alias("ids"))
        checksum = F.aggregate(
            F.zip_with(
                F.col("ids"),
                F.sequence(F.lit(1), F.size("ids")),
                lambda tid, i: tid.cast("bigint") * i,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return base.select(
            "doc_id",
            F.size("ids").cast("bigint").alias("n_tokens"),
            F.size(F.filter(F.col("ids"), lambda x: x == 0)).cast("bigint").alias("n_oov"),
            checksum.alias("ids_checksum"),
        )

    vocab_df = build_vocab(docs, size)
    tokens = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    encoded = tokens.join(F.broadcast(vocab_df), "w", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).cast("bigint").alias("tid"),
    )
    return encoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("int")).cast("bigint").alias("n_oov"),
        F.sum((F.col("pos") + 1) * F.col("tid")).cast("bigint").alias("ids_checksum"),
    )


def lm_bigram_score(docs: DataFrame) -> DataFrame:
    """CCNet/KenLM-style corpus-LM quality signal: train a bigram
    language model on the corpus itself and score every document by
    its mean per-bigram log-probability (a perplexity proxy — low
    scores flag gibberish / off-distribution text for filtering).

    P(w2|w1) is the maximum-likelihood estimate c(w1,w2)/c(w1·),
    where c(w1·) counts w1 as a bigram left-context; every bigram in
    the training corpus therefore has nonzero probability and the
    score is exact (no smoothing needed for self-scoring).

    Plan / scale: bigrams never shuffle as strings — each occurrence
    is reduced to (h1, h12) = (xxhash64(w1), xxhash64(w1h, w2h)) in a
    narrow JVM projection, so the count shuffles and the probability
    joins all key on 8-byte hashes (equal to string keys modulo 2⁻⁶⁴
    collisions). The model tables are Zipf-small relative to the
    corpus (distinct bigrams ≪ bigram OCCURRENCES), but at 100 TB the
    distinct-bigram table is still billions of rows — too big to
    broadcast. The probs join therefore runs as a sort-merge join on
    the 8-byte h12 key (scale-safe: both sides shuffle compact
    fixed-width rows); when the model table does fit under Spark's
    autoBroadcastJoinThreshold, AQE upgrades it to a broadcast join
    at runtime from the measured shuffle-stage size — no size gate is
    hand-coded because AQE's runtime statistics make the same
    decision with real numbers. The only per-occurrence shuffle is
    the final doc_id re-aggregation, which carries one
    (doc_id, logp) pair per bigram occurrence. Either join strategy
    is hash-keyed — a plan test asserts no cartesian/BNLJ can appear
    on the probs join.
    """
    # word-hash array materialized in its own projection — inlining it
    # makes Catalyst re-hash all words per element access (see
    # dedup._shingle_hashes for the measured 11× pitfall)
    with_wh = parallelize_narrow(docs).select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "), lambda w: F.xxhash64(w)).alias("wh"),
    )
    wh = F.col("wh")
    idx = F.sequence(F.lit(1), F.size(wh) - 1)
    grams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(wh, i).alias("h1"),
            F.xxhash64(F.element_at(wh, i), F.element_at(wh, i + 1)).alias("h12"),
        ),
    )
    bg = (
        with_wh.filter(F.size(wh) >= 2)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.h1").alias("h1"), F.col("g.h12").alias("h12"))
    )
    c2 = bg.groupBy("h12").agg(
        F.first("h1").alias("h1"),  # h1 is determined by h12
        F.count(F.lit(1)).alias("c12"),
    )
    c1 = c2.groupBy("h1").agg(F.sum("c12").alias("c1n"))
    probs = c2.join(c1, "h1").select(
        "h12", (F.log(F.col("c12") / F.col("c1n"))).alias("logp")
    )
    return (
        bg.join(probs, "h12")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
    )


def quality_ensemble(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Model-based quality filter: a fixed-weight logistic ensemble
    over the heuristic signals (log-length, stopword ratio,
    duplicate-word fraction) → one calibrated keep-probability per
    document plus the thresholded keep decision.

    This is the fastText/logistic "quality classifier" stage of a
    pretraining pipeline with the feature extraction expressed as
    JVM expressions — inference is a dot product inside whole-stage
    codegen, so at 100 TB it runs at scan speed with zero shuffles
    and zero Python. Swapping the hard-coded weights for a trained
    coefficient vector does not change the plan shape.
    """
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in _LANG_PROFILES["en"]])
    # O(|stopwords|) per token by linear array scan — acceptable only
    # because the list is a fixed ~30 entries (a Spark map literal
    # would scan linearly too; neither is a hash probe)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    stop_ratio = n_stop.cast("double") / n_words
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / n_words
    # intercept + weights: longer docs and stopword-bearing prose up,
    # heavy within-doc repetition down
    logit = (
        F.lit(-2.0)
        + F.lit(0.6) * F.log(n_words.cast("double"))
        + F.lit(4.0) * stop_ratio
        - F.lit(3.0) * dup_frac
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(dup_frac, 6).alias("dup_frac"),
        F.round(score, 6).alias("quality_p"),
        (score >= threshold).cast("int").alias("keep"),
    )
