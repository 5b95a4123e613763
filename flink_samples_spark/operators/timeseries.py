"""Time-series resampling (SURVEY.md §2.11 tier X): fixed-interval
bucketing with per-key gap fill and linear interpolation — the
hypertable-style rollup a metrics/time-series workload needs.

Plan shape (scale notes): one groupBy shuffle for the bucket
aggregate; the per-key spine is generated JVM-side with
``sequence()`` + ``explode`` (no driver loop, no cross join — each
key's array is its own span only); the two gap-fill windows order
bucket ASC and DESC respectively, so they share ONE (key) shuffle
but each gets its own Window operator and local sort — two linear
passes over co-partitioned data, no extra exchange. Interpolation
arithmetic is
plain double math on whole-second epochs — deterministic across
engines, so the operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_samples_spark.utils import epoch_double


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Bucket ``value_col`` to ``interval_seconds`` (per-bucket
    ``agg`` ∈ avg/max/min/sum), generate every bucket between each
    key's first and last, and linearly interpolate interior gaps.

    Cross-engine note: avg/sum accumulate doubles in engine-specific
    order, so a rounded result can straddle a rounding boundary by
    1 ulp — use max/min when the output must hash-match another
    engine bit-for-bit (they select a raw input value, no
    accumulation).

    Output: (key, bucket, value, filled) — ``filled`` marks
    interpolated rows."""
    if int(interval_seconds) <= 0:
        # fail fast: a zero interval otherwise dies deep in execution
        # ("sequence step must not be zero" at action time) and a
        # negative one builds a descending spine that matches nothing
        raise ValueError(
            f"resample_interpolate: interval_seconds must be positive, "
            f"got {interval_seconds!r}"
        )
    ivl = F.lit(int(interval_seconds))
    # epoch_double, not cast("double"): ts_col may be TIMESTAMP_NTZ
    # (driver parquet timestamp[us] with no tz), which Spark 4 refuses
    # to cast straight to DOUBLE.
    bucket = F.timestamp_seconds(
        (F.floor(epoch_double(df, ts_col) / ivl) * ivl).cast("bigint")
    )
    aggs = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}
    if agg not in aggs:
        raise ValueError(
            f"resample_interpolate: unsupported agg {agg!r}; "
            f"expected one of {sorted(aggs)}"
        )
    agg_fn = aggs[agg]
    agg_col = agg_fn(value_col)
    if agg in ("avg", "sum"):
        agg_col = F.round(agg_col, 6)
    bucketed = df.groupBy(F.col(key), bucket.alias("bucket")).agg(agg_col.alias("v"))
    spine = (
        bucketed.groupBy(key)
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            key,
            F.explode(
                F.sequence(
                    F.col("mn"),
                    F.col("mx"),
                    F.expr(f"INTERVAL {int(interval_seconds)} SECONDS"),
                )
            ).alias("bucket"),
        )
    )
    j = spine.join(bucketed, [key, "bucket"], "left")
    # BOTH look-arounds are GROWING frames (unboundedPreceding →
    # currentRow): the forward one runs over bucket DESC. A
    # (currentRow → unboundedFollowing) frame is a SHRINKING frame,
    # which Spark re-evaluates from scratch per row — O(rows²) per
    # key (measured 11 s of 13 s at sf0.1); a growing frame is a
    # running aggregate, O(rows). Same semantics: first non-null
    # at-or-after == last non-null in the reversed prefix.
    w_prev = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known_t = F.when(F.col("v").isNotNull(), F.col("bucket"))
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_t = F.last(known_t, ignorenulls=True).over(w_prev)
    next_v = F.last("v", ignorenulls=True).over(w_next)
    next_t = F.last(known_t, ignorenulls=True).over(w_next)
    # ((next-prev) * dt) / span — grouped exactly like SQL's left-to-
    # right `a * b / c`. NO rounding: IEEE ops on identical operands
    # in identical order are bit-exact across engines, while round()
    # implementations (BigDecimal vs scaled-FP) disagree by 1 ulp on
    # boundary values — the unrounded double is the more portable one
    interp = (
        prev_v
        + ((next_v - prev_v) * (F.col("bucket").cast("double") - prev_t.cast("double")))
        / (next_t.cast("double") - prev_t.cast("double"))
    )
    return j.select(
        key,
        "bucket",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


def ewma(
    df: "DataFrame",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
) -> "DataFrame":
    """Per-key exponentially-weighted moving average (adjust=False
    recursion: s₁=v₁, sₜ = α·vₜ + (1-α)·sₜ₋₁) — the smoothing
    primitive behind metric dashboards and drift monitors.

    A window function cannot express this (each row depends on the
    previous ROW'S RESULT, not on the previous rows' inputs), so it
    runs as ``applyInPandas`` per key: ONE shuffle on the key, then
    pandas' C-loop ``ewm`` inside each Arrow batch — the recursion is
    sequential per key but keys parallelize across executors, which
    is the only parallelism a per-key recursion admits. Memory is one
    key-group per call; for unbounded/streaming keys the
    applyInPandasWithState sessionizer pattern
    (streaming/stateful.py) is the incremental twin.

    Prefer a dyadic ``alpha`` (0.25, 0.5): α and 1-α are then exact
    binary floats and the recursion is bit-reproducible across
    engines.

    Precondition: ``(key, ts_col)`` unique (holds for the driver
    events table). On duplicate timestamps ANY engine's recursion
    order is ambiguous — this operator breaks ties by the remaining
    columns for run-to-run determinism, but a SQL oracle's
    ``row_number() OVER (ORDER BY ts)`` would not, so parity is only
    guaranteed under the precondition.
    """
    import pandas as pd

    if "ewma" in df.columns:
        raise ValueError(
            "ewma: input already has an 'ewma' column (re-smoothing a "
            "smoothed frame?) — rename or drop it first; a duplicate "
            "output field would mis-assign applyInPandas' by-name match"
        )
    # backquote names: a column with a space/hyphen must not break the
    # DDL parse of the output schema
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", ewma double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        others = [c for c in pdf.columns if c != ts_col]
        pdf = pdf.sort_values([ts_col, *others], kind="mergesort")
        s = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        # explicit half-away-from-zero at 6dp: ``.round`` is half-even
        # while SQL round() is half-away — on a bit-identical
        # recursion the conventions differ exactly at .5 boundaries,
        # so both engines apply THIS same formula instead
        pdf["ewma"] = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
        return pdf

    return df.groupBy(key).applyInPandas(smooth, schema=out_schema)
