"""Tier-C catalog: relational surface (SURVEY.md §2.2-2.7).

The reference ships a full SQL planner (flink-table-planner-loader,
pom.xml:135-140) — shipping the planner is a declared capability;
these queries exercise that surface over the driver's TPC-H-ish
tables, each with its DuckDB oracle twin.

Determinism rules applied throughout:
- every rank/lag/top-k ordering carries a unique tie-break key;
- double aggregates are ROUNDed identically on both sides (engines
  may accumulate in different orders);
- DuckDB SUM(BIGINT) → HUGEINT is CAST back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_samples_spark.operators import (
    anti_join,
    as_of_join,
    approx_count_distinct_agg,
    broadcast_join,
    cube_agg,
    global_topk,
    hash_agg,
    having,
    range_frame_agg,
    range_join,
    rollup_agg,
    running_agg,
    semi_join,
    sort_merge_join,
    star_join,
    topk_per_group,
    with_lag_lead,
    with_ntile,
    with_rank_columns,
)
from flink_samples_spark.plans.registry import query
from flink_samples_spark.sources.readers import load_table


# ---------------------------------------------------------------- §2.2 ----
@query(
    "q_project",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag_uc
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.upper("l_returnflag").alias("flag_uc"),
    )


@query(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'N')
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_linestatus LIKE 'O%'
      AND l_discount IS NOT NULL
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_linestatus").like("O%")
        & F.col("l_discount").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'done' ELSE 'open' END AS status_label
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "done").otherwise("open").alias("status_label"),
    )


# Casts chosen so both engines agree exactly: floor-then-cast for
# double→int (Spark truncates, DuckDB rounds — floor first removes the
# difference), int→string, int→double.
@query(
    "q_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(l_linenumber AS DOUBLE) AS line_dbl
    FROM lineitem
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


# ---------------------------------------------------------------- §2.3 ----
@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = broadcast_join(c, n, c.c_nationkey == n.n_nationkey)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "q_join_smj",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = sort_merge_join(li, o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, o.o_custkey == c.c_custkey, "left")
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return semi_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


# Non-equi: for each part, how many suppliers hold more balance than
# the part's price would need (a pure theta condition). part×supplier
# is the smallest big×small pair with a meaningful range predicate.
@query(
    "q_join_range",
    oracle="""
    SELECT p.p_partkey, COUNT(s.s_suppkey) AS n_richer
    FROM part p JOIN supplier s ON s.s_acctbal > p.p_retailprice
    GROUP BY p.p_partkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    joined = range_join(p, s, s.s_acctbal > p.p_retailprice)
    return joined.groupBy("p_partkey").agg(F.count("s_suppkey").alias("n_richer"))


@query(
    "q_join_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = star_join(
        li,
        [
            (o, li.l_orderkey == o.o_orderkey),
            (c, o.o_custkey == c.c_custkey),
            (n, c.c_nationkey == n.n_nationkey),
            (r, n.n_regionkey == r.r_regionkey),
        ],
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


# ---------------------------------------------------------------- §2.4 ----
# TPC-H Q1 shape: the canonical multi-agg pricing summary.
@query(
    "q_agg_multi",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped multi-aggregate over two group keys.

    r10 bench-flag closure (bench_compare r9→r10 local flagged 1.84×
    raw / 1.39× normalized on the committed snapshot's 0.423 s
    sample; code unchanged for many rounds): same-session interleaved
    min-of-7 on the SAME host window reads **0.330 s** — raw 1.43×
    vs the r9 local 0.230 s against a 1.33× drift factor ≈ 1.08×
    normalized, inside the band — and the family twins moved with the
    host, not with this query (q_agg_rollup 1.30× raw, q_filter
    1.06×). The snapshot caught a high draw of a sub-half-second
    query; min-of-2 does not fully de-noise at that resolution (the
    same sub-resolution effect the q_training_pipeline r9 flag
    documented).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return hash_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        ],
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# HLL++ sketch, made oracle-checkable by construction: the query emits
# a within-tolerance BOOLEAN comparing approx_count_distinct (rsd=0.05)
# against the exact count in the SAME plan, and the oracle asserts the
# invariant (`TRUE`) rather than the estimate.  Tolerance is 4×rsd
# (≈4σ, miss probability ~6e-5) with a small absolute floor for tiny
# groups.
@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag, TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    tol = F.greatest(F.col("exact_parts") * F.lit(0.20), F.lit(4.0))
    return agg.select(
        "l_returnflag",
        (F.abs(F.col("approx_parts") - F.col("exact_parts")) <= tol).alias(
            "within_tol"
        ),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        ],
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return cube_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [F.count(F.lit(1)).alias("n_rows")],
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 5
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return having(
        li,
        ["l_partkey"],
        [F.count(F.lit(1)).alias("n_lines")],
        F.col("n_lines") > 5,
    )


# ---------------------------------------------------------------- §2.5 ----
@query(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    ranked = with_rank_columns(
        c, ["c_nationkey"], [F.col("c_acctbal").desc(), F.col("c_custkey")]
    )
    return ranked.select("c_custkey", "c_nationkey", "c_acctbal", "rn", "rnk", "drnk")


@query(
    "q_win_laglead",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice) OVER w AS lag_val,
           lead(o_totalprice) OVER w AS lead_val
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = with_lag_lead(
        o, "o_totalprice", ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]
    )
    return out.select("o_orderkey", "o_custkey", "o_totalprice", "lag_val", "lead_val")


@query(
    "q_win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = running_agg(
        o,
        F.sum("o_totalprice"),
        "running_spend_raw",
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("running_spend_raw", 2).alias("running_spend"),
    )


# RANGE frame over a numeric ordering column: peers-by-value, so tie
# order never matters — deterministic without a tie-break.
@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = range_frame_agg(
        o, F.count(F.lit(1)), "n_near", ["o_custkey"], "o_totalprice", 50000
    )
    return out.select("o_orderkey", "o_custkey", "o_totalprice", "n_near")


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS tile,
           ROUND(percent_rank() OVER w, 6) AS pr
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    out = with_ntile(c, 4, [], [F.col("c_acctbal").desc(), F.col("c_custkey")])
    return out.select(
        "c_custkey",
        F.col("tile").cast("bigint").alias("tile"),
        F.round("pct_rank", 6).alias("pr"),
    )


# ---------------------------------------------------------------- §2.6 ----
# The driver's value-hash is order-insensitive, so sort correctness is
# asserted in tests/test_relational.py; here the oracle checks content.
@query(
    "q_sort",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_nationkey").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


@query(
    "q_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return global_topk(
        o.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rn FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      FROM customer)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    out = topk_per_group(c, ["c_nationkey"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 3)
    return out.select("c_custkey", "c_nationkey", "c_acctbal", "rn")


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           ROUND(median(l_quantity), 4) AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation — matches DuckDB's
    quantile_cont). Exact percentile sorts per group; at 100 TB prefer
    approx_percentile (t-digest-style sketch, mergeable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per l_linestatus value. Values list given
    explicitly — at scale, never let pivot() scan for distinct values."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
    )


@query(
    "q_fn_explode",
    oracle="""
    SELECT vec_id,
           CAST(pos.i - 1 AS INT) AS pos,
           embedding[pos.i] AS dim_value
    FROM embeddings, LATERAL (SELECT unnest(range(1, 9)) AS i) pos
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 8 embedding dims (1→N lateral)."""
    e = load_table(spark, sf_dir, "embeddings")
    sliced = e.select("vec_id", F.slice("embedding", 1, 8).alias("head"))
    return sliced.select(
        "vec_id", F.posexplode("head").alias("pos", "dim_value")
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH l AS (SELECT c_custkey, nullif(c_nationkey, 0) AS nk FROM customer),
         r AS (SELECT s_suppkey, nullif(s_nationkey, 0) AS nk FROM supplier)
    SELECT l.c_custkey, r.s_suppkey
    FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.nk
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of disappearing."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nk")
    )
    return c.join(s, c["nk"].eqNullSafe(s["nk"])).select("c_custkey", "s_suppkey")


@query(
    "q_join_asof",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts AS asof_ts, max(value) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.click_ts, p.asof_ts, p.p_value
    FROM clicks c
    ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.click_ts >= p.asof_ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Flink temporal table join / DuckDB ASOF JOIN): each
    click matched to the same user's most recent purchase at-or-before
    it. Union + running-last implementation: one shuffle, no range
    explosion (operators.joins.as_of_join)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    return as_of_join(
        clicks, purch, "user_id", left_ts="click_ts", right_ts="ts",
        payload=["p_value"],
    ).select("event_id", "user_id", "click_ts", "asof_ts", "p_value")


# Composite pipelines (filter → join → agg → top-k), TPC-H shapes ---------
@query(
    "q_pipeline_topk_revenue",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1999-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_pipeline_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → star join → revenue agg →
    global top-k (TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-06-01").cast("timestamp")
    )
    joined = li.join(broadcast_join(o, c, o.o_custkey == c.c_custkey), li.l_orderkey == o.o_orderkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return global_topk(
        agg.select("l_orderkey", "revenue", "o_orderdate"),
        [F.col("revenue").desc(), F.col("l_orderkey")],
        10,
    )


@query(
    "q_pipeline_filtered_agg",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_pipeline_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan (everything pushes
    to parquet) → global agg. The canonical scan-efficiency probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------- §2.7 ----
@query(
    "q_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal"))
    b = s.select(F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal"))
    return a.unionByName(b)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    # SQL EXCEPT is set semantics: subtract() removes a key entirely if
    # it appears anywhere in b (exceptAll would keep multiplicity
    # leftovers, which is EXCEPT ALL).
    return a.subtract(b)


@query(
    "q_pipeline_local_supplier",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_pipeline_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where customer and supplier must
    share a nation, region-filtered, revenue per nation. Plan shape at
    scale: lineitem (the only big table) never shuffles for the joins —
    orders⋈customer collapses behind a broadcast, supplier/nation/
    region broadcast onto lineitem — then one shuffle for the agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    oc = broadcast_join(o, c, F.col("c_custkey") == F.col("o_custkey"))
    joined = (
        li.join(F.broadcast(oc), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_pipeline_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_pipeline_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer,
    top-20. Lineitem filtered on the scan (pushdown), dims broadcast,
    TakeOrderedAndProject for the limit."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_pipeline_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q_pipeline_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    max-revenue supplier(s). The scalar-subquery max is a rank-1
    window over an UNPARTITIONED frame — fine here because the input
    to the window is the already-aggregated per-supplier table (|S|
    rows, not |lineitem|)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("total_revenue").desc())
    top = rev.withColumn("__rnk", F.rank().over(w)).filter(F.col("__rnk") == 1)
    s = load_table(spark, sf_dir, "supplier")
    return (
        top.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_pipeline_promo_share",
    oracle="""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_share
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
    """,
)
def q_pipeline_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast part
    join — promo revenue as a share of total. One broadcast, one
    global agg, no big-side shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0)))
                / F.sum(net),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q_dedup_latest",
    oracle="""
    WITH ranked AS (
        SELECT event_id, user_id, event_type, ts, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT event_id, user_id, event_type, ts, value
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style keep-latest dedup: one surviving row per
    (user_id, event_type) — the newest by event time, event_id as the
    deterministic tie-break. The batch mirror of streaming
    dropDuplicates upserts; at scale this is one shuffle on the key
    and a per-partition top-1 (no full sort)."""
    ev = load_table(spark, sf_dir, "events")
    return topk_per_group(
        ev.select("event_id", "user_id", "event_type", "ts", "value"),
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
        1,
    ).drop("rn")


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4)         AS var_qty,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           ROUND(corr(l_discount, l_extendedprice), 6)       AS corr_disc_price,
           -- Spark's skewness/kurtosis are POPULATION moments;
           -- DuckDB's skewness is sample G1 (convert) and
           -- kurtosis_pop is population excess (direct)
           ROUND(skewness(l_quantity)
                 * (COUNT(*) - 2)
                 / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 4) AS skew_qty,
           ROUND(kurtosis_pop(l_quantity), 4)     AS kurt_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: stddev/variance/covariance/
    correlation/skewness/kurtosis — single-pass co-moment
    accumulators, same two-phase partial→final shape as sum/avg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.corr("l_discount", "l_extendedprice"), 6).alias("corr_disc_price"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) + 1 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY CAST(floor(o_totalprice / 25000) AS BIGINT) + 1
    ORDER BY bucket
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket + groupBy — the
    distributed histogram build (each executor bins locally, partial
    counts merge)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6)    AS cume,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank/cume_dist over the
    default growing frame, nth_value over the full-partition frame
    (nth_value needs UNBOUNDED FOLLOWING to see the whole group)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


# approx_percentile's sketch is engine-internal → rows-only for the
# driver; tests/test_properties.py bounds its error against the exact
# percentile.
@query(
    "q_agg_approx_quantile",
    oracle="""
    SELECT l_returnflag, TRUE AS p50_ok, TRUE AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile) — the 100 TB
    path where exact percentile's per-group sort is unaffordable.
    accuracy=10000 → ~0.01% rank error, constant memory per group.

    Oracle-checkable by construction: the sketch value and the exact
    interpolated percentile are computed in the SAME aggregate, and the
    query emits within-1%-relative booleans; the oracle asserts the
    invariant (`TRUE`)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("p95"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
    )
    return agg.select(
        "l_returnflag",
        (F.abs(F.col("p50") - F.col("e50")) / F.col("e50") < 0.01).alias("p50_ok"),
        (F.abs(F.col("p95") - F.col("e95")) / F.col("e95") < 0.01).alias("p95_ok"),
    )


@query(
    "q_pipeline_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_pipeline_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate-of-aggregate — per-customer order
    counts, then the distribution of those counts. Two shuffles by
    construction (different keys); the second input is |customers|
    rows, so the re-shuffle is cheap at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c_orders = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_pipeline_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS yr,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, yr
    """,
)
def q_pipeline_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table joined TWICE under
    different roles (supplier nation vs customer nation) with a
    symmetric pair predicate, grouped by year. Both nation branches
    broadcast; lineitem joins orders via broadcast of the filtered
    order side after the dims prune it."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(o), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@query(
    "q_join_band",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM events a JOIN events b
      ON abs(epoch(a.ts) - epoch(b.ts)) <= 1.0
     AND a.event_id < b.event_id
    """,
)
def q_join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (co-occurrence within ±1 s, NO equi key)
    executed as an equi-join via the banding rewrite — the plan a
    nested loop can't deliver at scale (operators.joins.
    banded_range_join; the plan-audit test asserts no
    BroadcastNestedLoopJoin)."""
    from flink_samples_spark.operators import banded_range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    a = ev.select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    out = banded_range_join(a, b, "ts_a", "ts_b", 1.0)
    return out.filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the DataFrame API (Spark 4
    ``groupingSets``) — one pass over the fact table expands to the
    declared grouping combinations (same partial→final shape as
    rollup/cube, not one scan per set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@query(
    "q_join_asof_fwd",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts AS asof_ts, max(value) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.click_ts, p.asof_ts, p.p_value
    FROM clicks c
    ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.click_ts <= p.asof_ts
    """,
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the same user's FIRST
    purchase at-or-after it (attribution direction). Same union +
    running-first plan, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    return as_of_join(
        clicks, purch, "user_id", left_ts="click_ts", right_ts="ts",
        payload=["p_value"], direction="forward",
    ).select("event_id", "user_id", "click_ts", "asof_ts", "p_value")


# Mergeable distinct-count sketches (Spark 4 datasketches HLL): the
# 100 TB pattern where per-partition/per-day sketches are stored and
# UNIONED later instead of re-scanning raw data. Estimates are
# implementation-specific → rows-only for the driver; pytest bounds
# the error against exact COUNT DISTINCT.
@query("q_agg_hll_sketch", oracle="SELECT TRUE AS within_tol")
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag HLL sketches of the supplier set, unioned into a
    global estimate — sketch build, merge, and estimate in one plan
    (hll_sketch_agg → hll_union_agg → hll_sketch_estimate).

    Oracle-checkable by construction: the union estimate is joined
    (broadcast, constant key → single-row hash join) against the exact
    global COUNT DISTINCT and emitted as a within-5%-relative boolean
    (lgConfigK=14 → ~0.8% rse, so 5% is >6σ); the oracle asserts the
    invariant (`TRUE`)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey", F.lit(14)).alias("sk")
    )
    est = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "approx_suppliers"
        )
    ).withColumn("k", F.lit(1))
    exact = (
        li.agg(F.countDistinct("l_suppkey").alias("exact_suppliers"))
        .withColumn("k", F.lit(1))
    )
    joined = est.join(F.broadcast(exact), "k")
    return joined.select(
        (
            F.abs(F.col("approx_suppliers") - F.col("exact_suppliers"))
            / F.col("exact_suppliers")
            < 0.05
        ).alias("within_tol")
    )


# Skew-mitigation and co-location shapes as driver-checkable entries:
# the semantics are plain joins/aggregations (exact SQL oracles); what
# the variants add is the 100 TB physical plan — salting spreads a hot
# key over n reducers, bucketing removes the join shuffle entirely.
@query(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS sum_l_quantity,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators.skew.salted_agg): the
    result is an ordinary per-key sum/count; the plan fans the hot key
    over 16 deterministic salt buckets before merging, so no single
    reducer owns a hot key's rows."""
    from flink_samples_spark.operators import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        sum_cols=["l_quantity"],
        n_salts=16,
        # retry-deterministic salt from the table primary key
        id_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        "n_rows",
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT l_orderkey, l_partkey AS partkey, l_quantity, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated equi-join (operators.skew): the big side salts
    deterministically, the small side replicates once per salt value,
    so a hot part key spreads over 8 reducers instead of one."""
    from flink_samples_spark.operators import salted_broadcast_replicate_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_orderkey", "l_quantity"
    )
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    return salted_broadcast_replicate_join(
        li, pt, "partkey", n_salts=8, id_cols=["l_orderkey", "partkey", "l_quantity"]
    )


@query(
    "q_join_colocated",
    oracle="""
    SELECT o_orderkey, o_custkey AS custkey, c_name,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (operators.bucketing): both sides are
    written bucketBy(8, custkey) through the session catalog, so the
    SortMergeJoin plans with NO Exchange on either side — the shuffle
    was paid once at write time, amortized over every later join on
    the key (tests/test_bucketing.py asserts the no-Exchange plan)."""
    from flink_samples_spark.operators import colocated_join, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    write_bucketed(orders, "bkt_orders_q", ["custkey"], 8, sort_cols=["custkey"])
    write_bucketed(cust, "bkt_customer_q", ["custkey"], 8, sort_cols=["custkey"])
    out = colocated_join(spark, "bkt_orders_q", "bkt_customer_q", "custkey")
    return out.select(
        "o_orderkey", "custkey", "c_name", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@query(
    "q_join_asof_tol",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts AS p_ts, max(value) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.click_ts,
           CASE WHEN c.click_ts - p.p_ts <= INTERVAL 1 HOUR
                THEN p.p_ts END AS asof_ts,
           CASE WHEN c.click_ts - p.p_ts <= INTERVAL 1 HOUR
                THEN p.p_value END AS p_value
    FROM clicks c
    ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.click_ts >= p.p_ts
    """,
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof semantics):
    matches farther back than 1 hour are nulled. Exercises the
    NTZ-safe epoch path in as_of_join's tolerance filter."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    return as_of_join(
        clicks, purch, "user_id", left_ts="click_ts", right_ts="ts",
        payload=["p_value"], tolerance_seconds=3600.0,
    ).select("event_id", "user_id", "click_ts", "asof_ts", "p_value")


# ---------------------------------------------------------- reshape ----
# Wide reshape: order counts per priority × status. The value domain
# is pinned (no inference job); each pivot bucket is a conditional
# aggregate inside ONE partial→final pass — the oracle spells out the
# same CASE-WHEN counts. Empty buckets are coalesced to 0 on the
# Spark side because pivot emits null there while a CASE-count emits 0.
@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS st_open,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS st_filled,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS st_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators import pivot_agg

    o = load_table(spark, sf_dir, "orders")
    wide = pivot_agg(
        o, ["o_orderpriority"], "o_orderstatus", ["O", "F", "P"], F.count(F.lit(1))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("st_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("st_filled"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("st_partial"),
    )


# Long reshape (melt): one row per (line, measure). Narrow expand —
# no shuffle; the oracle is the equivalent UNION ALL.
@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators import unpivot

    li = load_table(spark, sf_dir, "lineitem")
    return unpivot(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


# MERGE INTO semantics over plain DataFrames: apply a deterministic
# change-set (updates, deletes, inserts synthesized from the customer
# table itself) to the snapshot. The snapshot never shuffles — change
# keys broadcast to an anti join; the oracle replays the same
# keep ∪ apply algebra.
@query(
    "q_merge_upsert",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal FROM customer
    ), ch AS (
      SELECT c_custkey, c_name, round(c_acctbal + 1000, 2) AS bal,
             'upsert' AS op
      FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey, c_name, round(c_acctbal, 2), 'delete'
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, 0.0, 'upsert'
      FROM customer WHERE c_custkey % 10 = 2
    )
    SELECT * FROM (
      SELECT c_custkey, c_name, bal FROM t
      WHERE c_custkey NOT IN (SELECT c_custkey FROM ch)
      UNION ALL
      SELECT c_custkey, c_name, bal FROM ch WHERE op <> 'delete'
    )
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    target = c.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal")
    )
    updates = c.filter(F.col("c_custkey") % 10 == 1).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 1000, 2).alias("bal"),
        F.lit("upsert").alias("op"),
    )
    deletes = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("delete").alias("op"),
    )
    inserts = c.filter(F.col("c_custkey") % 10 == 2).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        F.lit(0.0).alias("bal"),
        F.lit("upsert").alias("op"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return merge_upsert(target, changes, "c_custkey")


# §2.4 exact order statistics — the exact twins of the approx
# quantile/sketch family: interpolated and discrete percentiles plus
# deterministic mode (ties break to the smallest value on BOTH
# engines: Spark mode(col, true); the oracle orders n DESC, value ASC).
@query(
    "q_agg_percentiles",
    oracle="""
    WITH mc AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ), modes AS (
      SELECT l_returnflag, l_quantity AS mode_qty
      FROM mc
      QUALIFY row_number() OVER (
        PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC
      ) = 1
    ), pct AS (
      SELECT l_returnflag,
             ROUND(median(l_extendedprice), 6)            AS med_price,
             ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
             ROUND(quantile_disc(l_extendedprice, 0.75), 6) AS p75d_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT p.l_returnflag, p.med_price, p.p25_price, p.p75d_price,
           m.mode_qty
    FROM pct p JOIN modes m USING (l_returnflag)
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-statistic aggregates: median / percentile_cont /
    percentile_disc / deterministic mode. Exact percentiles need the
    group's values co-located (shuffle on the group key, per-group
    sort) — the scale trade the approx sketch family
    (q_agg_approx_quantile) exists to avoid; both are first-class.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 6).alias("med_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
        F.expr(
            "round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6)"
        ).alias("p75d_price"),
        F.expr("mode(l_quantity, true)").alias("mode_qty"),
    )


# §2.3 runtime-bloom-filter join: the strategy between broadcast and
# full shuffle for a 100 TB fact × selective-unbroadcastable dim.
# tests/test_plans.py asserts might_contain/bloom_filter_agg is in
# the pinned physical plan.
@query(
    "q_join_bloom",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators.joins import bloom_pruned_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return bloom_pruned_join(
        li,
        o,
        li["l_orderkey"] == o["o_orderkey"],
        finish=lambda j: j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        ),
    )


# Z-order (Morton) locality key — the Delta/Iceberg OPTIMIZE ZORDER
# primitive as a pure codegen'd bit-interleave; exact oracle (DuckDB
# replays the same bit arithmetic).
@query(
    "q_fn_zorder",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_partkey AS BIGINT) AS pa, CAST(l_suppkey AS BIGINT) AS sb
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST((
             SELECT SUM(
               (((pa >> i) & 1) << (2*i)) + (((sb >> i) & 1) << (2*i + 1))
             ) FROM range(16) t(i)
           ) AS BIGINT) AS zkey
    FROM b
    """,
)
def q_fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key("l_partkey", "l_suppkey", bits=16).alias("zkey"),
    )


# §2.4 EXACT distinct at scale via roaring-style bitmaps: per-bucket
# bitmap_construct_agg partials OR-merge (bitmap_or_agg) to the exact
# distinct count — the pre-aggregable exact alternative to both the
# shuffle-heavy COUNT(DISTINCT) expansion and the approximate HLL
# path (q_agg_approx_distinct / q_agg_hll_sketch): bitmap partials
# can be persisted per data increment and merged incrementally.
# bitmap positions are 1-based, hence the +1 shift (count unchanged).
@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag",
        F.expr("bitmap_bucket_number(l_suppkey + 1)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(l_suppkey + 1))").alias("bm")
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").cast("bigint").alias("n_suppliers")
    )


# Snapshot diff: v2 derived deterministically from v1 (drop
# doc_id%11==0, uppercase text of doc_id%13==0, append two new docs)
# so the classification is oracle-checkable end-to-end.
@query(
    "q_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, text FROM documents
    ), v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 1000000, 'new doc' FROM documents WHERE doc_id < 2
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.text <> v2.text THEN 'changed'
           END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.text <> v2.text
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators.behavior import snapshot_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 13 == 0, F.upper("text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 2).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.lit("new doc").alias("text"),
            )
        )
    )
    return snapshot_diff(docs, v2, key="doc_id", compare=["text"])


# Declarative data-quality audit: null / range / uniqueness checks in
# one scan + per-key tiny aggs; oracle recomputes each check in SQL.
@query(
    "q_data_quality",
    oracle="""
    SELECT 'null:l_shipdate' AS check,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS violations
    FROM lineitem
    UNION ALL
    SELECT 'range:l_quantity',
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'range:l_discount',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.05 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT)
    FROM lineitem
    """,
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators.behavior import data_quality_report

    li = load_table(spark, sf_dir, "lineitem")
    return data_quality_report(
        li,
        not_null=["l_shipdate"],
        unique=["l_orderkey"],
        ranges=[("l_quantity", 1, 50), ("l_discount", 0, 0.05)],
    ).select("check", F.col("violations").cast("bigint").alias("violations"))


# §2.7 multiplicity-preserving (ALL) set-operation variants: bag
# semantics differ materially from the set forms above — EXCEPT ALL
# keeps leftover multiplicity per key, INTERSECT ALL keeps
# min(multiplicity) copies; Spark plans both as count-compare aggs.
@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.exceptAll(b)


# §2.4 ordered string aggregation (LISTAGG ... WITHIN GROUP): the
# ANSI 2023 form, deterministic via the explicit ORDER BY.
@query(
    "q_agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
