"""Salted operators must be result-identical to their plain twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_samples_spark.operators.skew import salted_agg, salted_broadcast_replicate_join
from flink_samples_spark.sources.readers import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_l_quantity"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    salted = salted_agg(li, ["l_returnflag"], sum_cols=["l_quantity"], n_salts=16).select(
        "l_returnflag",
        F.round("sum_l_quantity", 4).alias("sum_l_quantity"),
        "n_rows",
    )
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_dir, "part")
    plain = (
        li.join(part, "p_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    salted = (
        salted_broadcast_replicate_join(li, part, "p_partkey", n_salts=8)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
