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


def test_salted_agg_with_id_cols_equals_plain(spark, sf_dir):
    """id_cols path: retry-deterministic content salt, same result."""
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_l_quantity"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        sum_cols=["l_quantity"],
        n_salts=16,
        id_cols=["l_orderkey", "l_linenumber"],
    ).select(
        "l_returnflag",
        F.round("sum_l_quantity", 4).alias("sum_l_quantity"),
        "n_rows",
    )
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_salt_id_cols_spread_and_determinism(spark):
    """A hot key of byte-identical rows with a unique id column must
    spread across buckets, and the bucket assignment must be a pure
    function of the id (the retry-safety property)."""
    from flink_samples_spark.operators.skew import _row_salt

    df = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id"), F.lit(1).alias("v")
    )
    s1 = df.withColumn("s", _row_salt(df, 8, ["id"]))
    n_buckets = s1.select("s").distinct().count()
    assert n_buckets == 8, f"hot key spread over {n_buckets} buckets, want 8"
    # same id → same salt on an independently-built plan
    s2 = df.withColumn("s", _row_salt(df, 8, ["id"]))
    assert s1.join(s2.withColumnRenamed("s", "s2"), "id").filter(
        F.col("s") != F.col("s2")
    ).count() == 0


def test_salt_missing_id_cols_raises(spark):
    import pytest

    from flink_samples_spark.operators.skew import _row_salt

    df = spark.range(5)
    with pytest.raises(ValueError, match="id_cols not in input"):
        _row_salt(df, 4, ["nope"])
