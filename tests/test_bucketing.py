"""Co-located bucketed join: correct results AND no shuffle Exchange."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flink_samples_spark.operators.bucketing import colocated_join, write_bucketed
from flink_samples_spark.sources.readers import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    joined = colocated_join(
        spark,
        "b_lineitem",
        "b_orders",
        on=[spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey],
    )
    # bucketed-scan join must not exchange either side
    plan = _plan(joined)
    assert "Exchange" not in plan, plan

    got = (
        joined.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert got.subtract(expected).count() == 0
    assert expected.subtract(got).count() == 0
