"""Behavioral / event-sequence analytics operators.

The reference's event stream (timestamped Pojo records,
`/root/reference/src/main/java/org/example/CassandraPojoSinkStreaming.java:109-148`)
is the data shape these operate on; the operators themselves are the
standard product-analytics queries an engine over such a stream must
answer (funnel conversion, cohort retention, dimension history).

All three are pure DataFrame compositions whose only shuffles are
keyed on ``user_id`` — consecutive stages reuse the same hash
partitioning, so at 100 TB the chain is one exchange followed by
co-partitioned joins/windows (AQE keeps them local).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts: stage k counts users who
    performed ``steps[k]`` strictly AFTER their stage-(k-1) time
    (first qualifying occurrence, the standard product-analytics
    definition).

    Returns (stage int, event_type, n_users) — one row per step.

    Scale: one shuffle keyed on the user establishes stage 0; every
    later stage is a join of the (user, reached-time) frame — at most
    one row per user — against the type-filtered event scan, both
    sides hashed on the same key. No per-user event sorting, no
    Python, no window over the raw stream, and no driver-side
    actions: the result is a union of 1-row aggregates in ONE lazy
    plan.
    """
    u, t = F.col(user_col), F.col(ts_col)

    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("stage_ts"))
    )
    out = None
    for i, step in enumerate(steps):
        if i > 0:
            nxt = events.filter(F.col(type_col) == step).select(
                u.alias("__u"), t.alias("__t")
            )
            reached = (
                reached.join(
                    nxt,
                    (reached[user_col] == F.col("__u"))
                    & (F.col("__t") > F.col("stage_ts")),
                )
                .groupBy(user_col)
                .agg(F.min("__t").alias("stage_ts"))
            )
        stage_row = reached.agg(
            F.count(F.lit(1)).alias("n_users")
        ).select(
            F.lit(i).alias("stage"),
            F.lit(step).alias("event_type"),
            F.col("n_users"),
        )
        out = stage_row if out is None else out.unionByName(stage_row)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 604800,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the epoch-week of
    their first event; each cell counts distinct cohort users active
    ``week_offset`` buckets later.

    Epoch-second bucketing (not calendar weeks) keeps the bucket
    function engine-agnostic — no week-start or locale semantics.

    Scale: first-event per user is one keyed aggregation; the join
    back is co-partitioned on the same key; the cell count is a
    distinct-aggregate whose key space (cohort × offset) is tiny, so
    the final shuffle is negligible.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(sec).alias("first_sec")
    )
    joined = events.select(
        F.col(user_col), sec.alias("ev_sec")
    ).join(firsts, user_col)
    return (
        joined.select(
            F.col(user_col),
            F.floor(F.col("first_sec") / bucket_s).alias("cohort_week"),
            (
                F.floor(F.col("ev_sec") / bucket_s)
                - F.floor(F.col("first_sec") / bucket_s)
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    key's event stream into state intervals — one row per state
    CHANGE with (valid_from, valid_to, is_current).

    Consecutive identical states merge (the classic SCD2 dedup);
    ordering is (ts, tiebreak) so simultaneous events are
    deterministic.

    Scale: two window functions over ONE partitioning (key, ordered
    by time) — a single shuffle; the change-filter drops rows before
    the second window re-sort. This is the batch backfill twin of a
    streaming `applyInPandasWithState` updater.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # NULL-safe change detection: ``__prev IS NULL`` cannot mark the
    # first row (it also fires when the PREVIOUS STATE is NULL, which
    # would start the NULL interval late and break the merge of
    # consecutive NULL states) — the first row needs its own marker,
    # and the state comparison must treat NULL as a value (<=>).
    changes = (
        events.select(key_col, state_col, ts_col, tiebreak_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(state_col).eqNullSafe(F.col("__prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Snapshot diff: classify every key as ``added`` / ``removed`` /
    ``changed`` (any ``compare`` column differs) between two corpus
    versions — the audit/maintenance primitive behind incremental
    refresh validation and change-data-feed generation when no
    transactional table format records it for you.

    ONE full-outer shuffle join on the key; the change test compares
    an xxhash64 over the compare columns computed map-side, so wide
    payloads never cross the shuffle twice — at 100 TB the shuffle
    carries (key, 8-byte hash) per side plus the join's row pairing.
    Unchanged keys are dropped (the overwhelmingly common case, so
    output ≪ input).

    The key join is NULL-safe (``<=>``): a row whose key is NULL on
    both sides pairs up like any other value instead of surfacing as
    a spurious added+removed pair. Caveat shared with the repo's
    other hash-compare operators: two versions whose compare columns
    collide under xxhash64 (probability 2⁻⁶⁴ per key) report as
    unchanged.

    The hash frames NULLs explicitly: Spark's hash functions SKIP a
    NULL argument entirely (xxhash64(NULL, x) == xxhash64(x) ==
    xxhash64(x, NULL) — struct-wrapping hashes identically), so a
    change that moves a value between compare columns while NULLing
    the other would read as unchanged; interleaving each column with
    its is-null flag makes the position of the NULL part of the hash.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def _h(alias: str):
        framed = [
            e for c in compare for e in (F.col(c), F.col(c).isNull().cast("int"))
        ]
        return F.xxhash64(*framed).alias(alias)

    oh = old.select(*keys, _h("__h_old"))
    nh = new.select(
        *[F.col(k).alias(f"__n_{k}") for k in keys],
        _h("__h_new"),
    )
    cond = None
    for k in keys:
        c = oh[k].eqNullSafe(nh[f"__n_{k}"])
        cond = c if cond is None else cond & c
    j = oh.join(nh, cond, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return j.select(
        *[F.coalesce(oh[k], nh[f"__n_{k}"]).alias(k) for k in keys],
        status.alias("status"),
    ).filter(F.col("status").isNotNull())


def data_quality_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Sequence[tuple[str, float, float]] = (),
) -> DataFrame:
    """Declarative data-quality audit: one row per check with its
    violation count — null checks, key-uniqueness checks, and
    numeric range checks over a table, all folded into ONE aggregate
    over ONE scan of the input.

    The null and range checks are conditional counts and uniqueness
    is count(*) - count_distinct(key), all in the same ``df.agg``:
    Catalyst plans the mixed distinct/non-distinct aggregate as a
    single scan feeding an Expand (one duplicated pass per distinct
    key IN THE SHUFFLE, never a re-read of the table — the 100 TB
    cost that separate per-key aggregates would incur). Output is
    O(checks) rows — the shape a CI gate or freshness monitor
    consumes.
    """
    if not (not_null or unique or ranges):
        raise ValueError("data_quality_report: no checks requested")
    aggs = []
    names = []
    # SUM over zero non-null rows is NULL, not 0 — an empty table (the
    # classic upstream-outage case a DQ gate exists to catch) must
    # report 0 violations, not a NULL that a `violations > 0` filter
    # silently passes over
    for c in not_null:
        aggs.append(F.coalesce(F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)))
        names.append(f"null:{c}")
    for c, lo, hi in ranges:
        aggs.append(
            F.coalesce(
                F.sum(((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))).cast("bigint")),
                F.lit(0),
            )
        )
        names.append(f"range:{c}")
    for c in unique:
        aggs.append(F.count(F.lit(1)) - F.count_distinct(F.col(c)))
        names.append(f"unique:{c}")
    base = df.agg(*[a.alias(f"c{i}") for i, a in enumerate(aggs)])
    return base.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(n).alias("check"), F.col(f"c{i}").alias("violations"))
                for i, n in enumerate(names)
            ])
        ).alias("r")
    ).select("r.check", "r.violations")


def detect_sequence(
    events: DataFrame,
    pattern: Sequence[str],
    within_seconds: float,
    type_col: str = "event_type",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """CEP-style sequence detection — the Flink-CEP "A followed-by B
    followed-by C within T" pattern (relaxed contiguity, earliest
    match) re-expressed relationally: for every occurrence of
    ``pattern[0]``, chain the EARLIEST later occurrence of each
    subsequent type (events of other types may interleave), and keep
    chains whose total span fits ``within_seconds``.

    Each "followed by earliest" step is one forward
    :func:`~flink_samples_spark.operators.joins.as_of_join` — the
    union + reversed running-window trick — so a k-step pattern costs
    k-1 key-shuffles with O(1) window state per row, never a
    per-event NFA or a range-join blowup. Output: one row per
    pattern-0 occurrence that completes the chain, with each stage's
    timestamp (``ts_0`` … ``ts_{k-1}``).

    Greedy-earliest semantics (each stage binds to the first eligible
    event after the previous stage) — the standard CEP
    ``followedBy`` + ``AFTER MATCH SKIP TO NEXT ROW`` interpretation;
    overlapping matches anchored at different pattern-0 events are
    all reported.

    Tie caveat for repeated non-adjacent types (e.g. A,B,A): the
    at-or-after (>=) chaining can bind ONE physical event to two
    stages of the repeated type when timestamps tie, where the
    streaming NFA (:func:`~flink_samples_spark.streaming.stateful.
    cep_with_state`), like Flink CEP, consumes each event once. The
    two agree exactly for distinct-type patterns, and for repeated
    types whenever (key, ts) is unique.
    """
    from flink_samples_spark.operators.joins import as_of_join
    from flink_samples_spark.utils import epoch_double

    if len(pattern) < 2:
        raise ValueError("pattern needs at least two stages")
    if any(a == b for a, b in zip(pattern, pattern[1:])):
        raise ValueError(
            "adjacent stages of equal type need strictly-after "
            "semantics the at-or-after as-of rewrite cannot express "
            "(and (key, ts)-unique data makes them equivalent "
            "otherwise); use streaming.stateful.cep_with_state, whose "
            "NFA opens an anchor only after the advance pass"
        )
    cur = (
        events.filter(F.col(type_col) == pattern[0])
        .select(key, F.col(ts_col).alias("ts_0"))
    )
    for i, p in enumerate(pattern[1:], start=1):
        right = events.filter(F.col(type_col) == p).select(key, ts_col)
        cur = as_of_join(
            cur,
            right,
            key=key,
            left_ts=f"ts_{i-1}",
            right_ts=ts_col,
            payload=[],
            direction="forward",
            matched_ts_col=f"ts_{i}",
        ).filter(F.col(f"ts_{i}").isNotNull())
    span = epoch_double(cur, f"ts_{len(pattern)-1}") - epoch_double(cur, "ts_0")
    return cur.filter(span <= F.lit(float(within_seconds)))
