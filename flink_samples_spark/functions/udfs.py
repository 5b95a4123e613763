"""User-code extension surface (SURVEY.md §2.10).

The reference's extension points are a custom SourceFunction
(CassandraPojoSinkStreaming.java:109-148) and a sink Encoder lambda
(DataStreamJob.java:53-56). The PySpark-idiomatic user-code surface
is: vectorized pandas UDFs (scalar), grouped-agg pandas UDFs (UDAF),
``mapInPandas`` (UDTF, 1→N), and ``applyInPandas`` (per-group
transform).

Scale notes: all four run Arrow-batched (columnar transfer, no
per-row pickling); ``applyInPandas`` shuffles once on the group key
and materializes ONE GROUP AT A TIME per task — fine for bounded
groups (a user's events), wrong for unbounded ones (use window
functions instead). Row-at-a-time ``F.udf`` is deliberately absent:
it is the slow path and nothing here needs it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_samples_spark.utils import parallelize_narrow


# UDFs are built inside each constructor: pandas_udf resolves its DDL
# return type against the active SparkSession, so module-import-time
# decoration would require a session before any engine code runs.


# --- scalar pandas UDF ----------------------------------------------------
def doc_score_pandas_udf(docs: DataFrame) -> DataFrame:
    @pandas_udf("bigint")
    def doc_score(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        # Deterministic, SQL-expressible on purpose (the oracle
        # recomputes it): 2*len(text) + n_chars. The point is the
        # Arrow plumbing. Nullable Int64: a NULL text/n_chars row
        # yields NULL (astype('int64') on the NaN from str.len()
        # would kill the whole task instead).
        return (2 * text.str.len() + n_chars).astype("Int64")

    return docs.select(
        "doc_id", doc_score(F.col("text"), F.col("n_chars")).alias("score")
    )


# --- grouped-agg pandas UDF (UDAF) ---------------------------------------
def weighted_avg_grouped_agg(events: DataFrame) -> DataFrame:
    """Per-user weighted average of ``value`` weighted by
    (event_id % 7 + 1) — a UDAF with a closed-form SQL twin.
    (Grouped-AGG pandas_udf, not applyInPandas — the per-group
    TRANSFORM example is :func:`zscore_applyinpandas`.)"""

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        # NULL semantics: a (v, w) pair contributes only when v is
        # non-NULL — weights of NULL values are masked out of the
        # denominator too, or every NULL value deflates the average.
        # (Plain SQL SUM(w) would NOT skip those rows; the oracle
        # therefore uses SUM(CASE WHEN value IS NOT NULL THEN w END).)
        # An all-NULL group emits SQL NULL (None), not the NaN that
        # rides Arrow as a non-null double.
        m = v.notna()
        denom = w[m].sum()
        if not m.any() or denom == 0:
            return None
        return float((v * w).sum() / denom)

    weighted = events.withColumn("w", (F.col("event_id") % 7 + 1).cast("double"))
    return weighted.groupBy("user_id").agg(
        F.round(weighted_avg(F.col("value"), F.col("w")), 6).alias("wavg")
    )


# --- UDTF (1→N) via mapInPandas ------------------------------------------
def words_udtf(docs: DataFrame) -> DataFrame:
    """Explode documents into words (1 row → N rows), Arrow-batched."""

    def explode_words(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf[["doc_id", "lang", "text"]].copy()
            words["word"] = words["text"].str.split(" ")
            out = words.explode("word")[["doc_id", "lang", "word"]]
            yield out

    return parallelize_narrow(docs).mapInPandas(
        explode_words, "doc_id bigint, lang string, word string"
    )


# --- per-group transform via applyInPandas -------------------------------
def zscore_applyinpandas(events: DataFrame) -> DataFrame:
    """Per-user z-score of ``value`` (sample stddev, ddof=1 — matches
    SQL stddev_samp)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        # stddev_samp parity: a 1-row group (std=NaN) or a constant
        # group (std=0 -> inf) must emit NULL like the SQL twin. A
        # plain float64 NaN rides Arrow as NaN, NOT as SQL NULL (an
        # IS NULL downstream would miss it) — the nullable Float64
        # dtype maps NaN/NA to a true Arrow null.
        z = z.replace([np.inf, -np.inf], np.nan).round(6).astype("Float64")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z}
        )

    return events.groupBy("user_id").applyInPandas(
        zscore, "event_id bigint, user_id bigint, z double"
    )


def priority_label_arrow_udf(orders: DataFrame) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (``useArrow=True``): scalar
    Python logic without the row-at-a-time pickle path — batches move
    as Arrow arrays (ArrowEvalPython in the plan, not the
    BatchEvalPython the plan-audit test bans). Still slower than
    built-ins or pandas_udf for numeric work; the right tool when the
    logic is genuinely per-value Python (string munging, lookups)."""
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def label(status: str, price: float) -> str:
        # Arrow-optimized UDFs pass NULLs through as None: emit NULL
        # instead of dying on the first null row
        if status is None or price is None:
            return None
        tier = "big" if price >= 200000 else "small"
        return f"{status.lower()}:{tier}"

    return orders.select(
        "o_orderkey",
        label("o_orderstatus", "o_totalprice").alias("order_label"),
    )


def register_ngrams_udtf(spark) -> None:
    """Register the Python UDTF ``doc_ngrams(text, n)`` for SQL
    LATERAL use — the table-function API surface (SURVEY §2.10): a
    class-based generator the SQL planner invokes per row, Arrow-
    serialized (``useArrow=True`` ⇒ ArrowEvalPythonUDTF, not the
    banned row-pickling BatchEvalPython node). Distinct from the
    mapInPandas UDTF path (:func:`words_udtf`): this one is callable
    from SQL text, composes with LATERAL correlation, and carries
    its own output schema."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string", useArrow=True)
    class DocNgrams:
        def eval(self, text: str, n: int):
            if text is None or n is None or n < 1:
                return
            ws = text.split(" ")
            for i in range(max(len(ws) - n + 1, 0)):
                yield i, " ".join(ws[i : i + n])

    spark.udtf.register("doc_ngrams", DocNgrams)
