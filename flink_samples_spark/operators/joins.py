"""Join operators (SURVEY.md §2.3).

The reference contains no explicit joins; the capability comes from
the SQL planner it ships (flink-table-planner-loader,
pom.xml:135-140). Here each join family is a constructor that picks
the physical strategy Catalyst should use — via hints, not custom
execution code.

Scale notes (100 TB):
- ``broadcast_join``: dims (region/nation/supplier/part at TPC-H
  shape) stay far under the broadcast threshold even at SF100k —
  replicating the dim avoids shuffling the fact table entirely.
- ``sort_merge_join``: the big×big path; both sides shuffle on the
  key once, AQE splits skewed partitions
  (``spark.sql.adaptive.skewJoin``).
- ``range_join``: non-equi conditions fall back to
  BroadcastNestedLoopJoin; keep the broadcast side small (it is
  O(|small|) memory per executor) — at scale, band the range into
  buckets first (equi-join on bucket, residual predicate after) to
  avoid the cartesian blowup.
- ``star_join``: chained broadcasts on the dim chain; only the
  fact table ever shuffles (for the final agg), which is the plan a
  1000-executor cluster wants.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_samples_spark.utils import epoch_double


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the dimension side replicated to every executor."""
    return fact.join(F.broadcast(dim), on, how)


def sort_merge_join(
    left: DataFrame, right: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Big×big equi-join: force shuffle + sort-merge (MERGE hint)."""
    return left.join(right.hint("merge"), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match (left columns only)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return left.join(right, on, "left_anti")


def range_join(left: DataFrame, right: DataFrame, cond: Column, how: str = "inner") -> DataFrame:
    """Non-equi (theta/range) join. Physical plan is a nested-loop with
    the smaller side broadcast; see module docstring for the banding
    rewrite at scale."""
    return left.join(F.broadcast(right), cond, how)


def star_join(fact: DataFrame, dims: Sequence[tuple[DataFrame, str | Column]]) -> DataFrame:
    """Multi-way star join: fact ⋈ dim1 ⋈ dim2 ⋈ … with every dim
    broadcast, so the fact table never shuffles for the joins."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    matched_ts_col: str = "asof_ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each ``left`` row, the single ``right`` row with
    the nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) the left row's ``left_ts``, matched per ``key``.
    Left-outer semantics: unmatched left rows keep null payload.

    The temporal-table-join capability of the reference's planner
    (flink-table-planner-loader, pom.xml:135-140) — Flink expresses it
    as ``FOR SYSTEM_TIME AS OF``; DuckDB as ``ASOF JOIN``.

    NOT implemented as a range join (which explodes to a
    broadcast-nested-loop and needs a post-hoc row_number to keep the
    nearest match). Instead the scalable union trick: tag the two
    inputs, union them, and run one running ``last(payload,
    ignorenulls=True)`` window per key ordered by (ts, tag) — right
    rows sort before left rows at equal ts, so exact-timestamp matches
    are taken. ONE shuffle on ``key``, a per-partition sort, O(1)
    window state per row: the same cost shape as a sort-merge join,
    and it survives 100 TB where a range join would not.

    Requires unique ``(key, right_ts)`` on the right side (any as-of
    result is ambiguous otherwise) — dedupe upstream.
    ``tolerance_seconds`` nulls out matches farther than the bound
    (pandas ``merge_asof`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    rpay = (
        list(payload)
        if payload is not None
        else [c for c in right.columns if c not in (*keys, right_ts)]
    )
    clash = (set(rpay) | {matched_ts_col}) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    if matched_ts_col in rpay:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} collides with a payload column")
    internal = {"__ts", "__tag", "__match"} & (set(left.columns) | set(right.columns))
    if internal:
        raise ValueError(
            f"inputs may not contain the internal columns {sorted(internal)}: "
            "rename them before as_of_join"
        )

    # Equi-join NULL semantics: a NULL key never matches — but
    # Window.partitionBy groups NULL key values into ONE partition, so
    # without this filter a NULL-key left row would take payload from
    # NULL-key right rows. Dropping NULL-key right rows leaves NULL-key
    # left rows alone in their partition → NULL payload, as a SQL
    # left-outer equi-join (FOR SYSTEM_TIME AS OF) would produce.
    r = right
    for k in keys:
        r = r.filter(F.col(k).isNotNull())
    # the matched row travels as ONE struct: filling each payload
    # column with its own last(ignorenulls) would let a NULL payload
    # VALUE in the matched row pull a stale value from an older right
    # row — a chimera of several right rows. last(ignorenulls) on the
    # struct picks whole rows; NULL payload fields inside survive.
    r = r.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias(matched_ts_col),
            *[F.col(c) for c in rpay],
        ).alias("__match"),
        F.lit(0).alias("__tag"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # Backward: growing prefix over ascending __ts; right rows (tag 0)
    # sort before left rows at equal __ts, so exact matches are taken.
    # Forward: growing frame over the REVERSED ordering, not a
    # (currentRow → unboundedFollowing) shrinking frame — Spark
    # re-evaluates shrinking frames from scratch per row, O(rows²)
    # per key. NULL ordering is pinned on both directions so a left
    # row with NULL left_ts sorts before every right row and gets
    # NULL payload (desc's default NULLS LAST would hand it the
    # whole-partition prefix — a spurious match to the min-ts row).
    order = (
        [F.col("__ts").asc_nulls_first(), F.col("__tag").asc()]
        if direction == "backward"
        else [F.col("__ts").desc_nulls_first(), F.col("__tag").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = list(left.columns)
    matched = F.last("__match", ignorenulls=True).over(w)
    out = u.select(*keep, F.col("__tag"), matched.alias("__match")).filter(
        F.col("__tag") == 1
    )
    fill_cols = [matched_ts_col, *rpay]
    unpacked = [F.col("__match").getField(c).alias(c) for c in fill_cols]
    out = out.select(*keep, *unpacked)
    if tolerance_seconds is not None:
        # epoch_double, not cast("double"): left_ts may be
        # TIMESTAMP_NTZ (driver parquet), which refuses a direct
        # double cast in Spark 4.
        gap = F.abs(
            epoch_double(out, left_ts) - epoch_double(out, matched_ts_col)
        )
        within = gap <= F.lit(float(tolerance_seconds))
        out = out.select(
            *keep,
            *[F.when(within, F.col(c)).alias(c) for c in fill_cols],
        )
    return out


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_point: str,
    delta_seconds: float,
) -> DataFrame:
    """Pairs (l, r) with ``|l.left_point - r.right_point| ≤ delta``
    (timestamp columns) — WITHOUT a nested-loop join.

    The banding rewrite this module's docstring promises: bucket the
    time axis at ``delta`` width; a right row can only match left
    rows in its own or an adjacent bucket, so replicating each right
    row to the 3 buckets its ``±delta`` window can touch
    (floor((p±δ)/δ) is always mid∓1 for δ>0, so the replication
    factor is exactly 3 — the shuffle carries 3× the right side,
    independent of data size) turns the range condition into an
    EQUI-join on bucket + a residual filter. Physical plan:
    shuffle/broadcast hash join — O(n) state instead of the O(n·m)
    scan a BroadcastNestedLoopJoin pays; the plan survives 100 TB
    where the nested loop cannot.

    Each right row lands in each overlapped bucket ONCE
    (array_distinct), and a left row has exactly one bucket, so no
    pair-dedup pass is needed.
    """
    if "__bucket" in set(left.columns) | set(right.columns):
        raise ValueError(
            "inputs may not contain the internal column '__bucket': "
            "rename it before banded_range_join"
        )
    w = float(delta_seconds)
    if w <= 0:
        # fail fast: delta 0 would ANSI-divide-by-zero in the bucket
        # floor at execution; a negative delta silently matches nothing
        raise ValueError(
            f"banded_range_join: delta_seconds must be positive, got "
            f"{delta_seconds!r}; for exact-timestamp matching use an equi-join"
        )
    # epoch_double binds the source frame's attribute id, so lp/rp
    # stay unambiguous after the join even when both sides share the
    # point-column name; handles TIMESTAMP_NTZ (driver parquet).
    lp = epoch_double(left, left_point)
    rp = epoch_double(right, right_point)
    lb = F.floor(lp / F.lit(w)).alias("__bucket")
    r_lo = F.floor((rp - w) / F.lit(w))
    r_hi = F.floor((rp + w) / F.lit(w))
    l = left.select("*", lb)
    r = right.select(
        "*",
        F.explode(F.array_distinct(F.array(r_lo, r_hi, F.floor(rp / F.lit(w))))).alias(
            "__bucket"
        ),
    )
    # lp/rp stay bound to the original frames' attribute ids, so the
    # residual filter is unambiguous even when both sides share the
    # point column name
    out = l.join(r, "__bucket").filter(F.abs(lp - rp) <= w)
    return out.drop("__bucket")


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO semantics over plain DataFrames — apply a change-set
    to a snapshot: matched rows are REPLACED by the change row
    (op='upsert'), matched rows with op='delete' are dropped, and
    unmatched non-delete change rows are INSERTED. The incremental
    snapshot-refresh step behind corpus/table maintenance when no
    transactional table format is available (the reference ships no
    MERGE either; this is the planner-surface generalization).

    ``changes`` must carry the full target schema plus ``op_col``.

    Scale: a change-set is small relative to the snapshot it amends,
    so the change keys BROADCAST to an anti join — the snapshot
    never shuffles; the surviving change rows are unioned on top.
    Output partitioning = target partitioning ∪ one small appendix.
    For a change-set too large to broadcast, Catalyst falls back to a
    shuffled anti join on the same plan.
    """
    keep = target.join(
        F.broadcast(changes.select(key)), key, "left_anti"
    )
    # validate op per row IN the plan: a NULL/typo op would otherwise
    # act as a silent DELETE (the anti join removes the key, and
    # three-valued `op != 'delete'` drops the re-insert)
    op_ok = F.when(
        F.col(op_col).isin("upsert", "delete"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"merge_upsert: invalid {op_col}="),
                F.coalesce(F.col(op_col), F.lit("NULL")),
                F.lit(" (expected 'upsert' or 'delete')"),
            )
        )
    )
    apply_rows = changes.filter(op_ok != "delete").drop(op_col)
    return keep.unionByName(apply_rows)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "inner",
    finish: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Big×selective join with a RUNTIME BLOOM FILTER pruning the fact
    side before its shuffle: Catalyst's InjectRuntimeFilter plants a
    ``bloom_filter_agg`` subquery over the (filtered) dim keys and a
    ``might_contain`` predicate into the fact scan, so fact rows that
    cannot match are dropped map-side — the shuffle carries only
    probable matches. THE join strategy for a 100 TB fact against a
    selective-but-unbroadcastable dim (the gap between broadcast
    hash join and a full shuffle).

    At production scale the rule fires on its own (fact scans exceed
    the 10 GB application-side threshold and real dims exceed the
    broadcast threshold). At test scale neither holds, so the planner
    confs that gate the rule are scoped to THIS DataFrame via
    :func:`~flink_samples_spark.utils.pin_plan_with_confs` — the
    session's other queries keep their broadcast plans. Semantics are
    conf-independent (bloom false positives only pass extra rows to
    the exact join).

    ``finish`` (optional) maps the joined frame to the final plan
    (e.g. the consuming aggregation) BEFORE pinning — plan memoization
    is per-Dataset, so only the returned DataFrame carries the
    bloom-planned physical plan; composing on top of it would re-plan
    without the scoped confs.
    """
    from flink_samples_spark.utils import pin_plan_with_confs

    joined = fact.join(dim, on, how)
    if finish is not None:
        joined = finish(joined)
    return pin_plan_with_confs(
        joined,
        {
            # make the dim unbroadcastable (100 TB posture) so the
            # bloom path is the one being planned and measured
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # the fact scan "is big" at any test sf
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        },
    )
