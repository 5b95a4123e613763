"""Tier-C catalog: scalar function families + UDF surface
(SURVEY.md §2.8, §2.10).

One representative query per function family, each exercising the
minimum set from the survey. Dialect care: Spark/DuckDB agree on
substring (1-based), regexp_extract group args, greatest/least;
divergences handled explicitly — DuckDB has no pmod (emulated),
returns DATE from date_trunc('month') (cast back), ceil(double) is
double (Spark: bigint — cast both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_samples_spark.functions.udfs import (
    doc_score_pandas_udf,
    weighted_avg_grouped_agg,
    words_udtf,
    zscore_applyinpandas,
)
from flink_samples_spark.plans.registry import query
from flink_samples_spark.sources.readers import load_table


# ---------------------------------------------------------------- §2.8 ----
@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, ':', p_type) AS brand_type,
           substring(p_name, 1, 8) AS name_pfx,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           trim(p_name) AS name_trim,
           CAST(length(p_name) AS BIGINT) AS name_len,
           regexp_extract(p_type, '([a-z]+)$', 1) AS type_last_word,
           str_split(p_type, ' ')[1] AS type_first_word,
           CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_last_word"),
        F.split("p_type", " ").getItem(0).alias("type_first_word"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("has_red"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_pmod,
           round(pow(l_quantity, 2), 4) AS qty_sq,
           round(ln(l_extendedprice), 6) AS price_ln
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_pmod"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


@query(
    "q_fn_null",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_pos,
           least(c_acctbal, 1000.0) AS bal_capped,
           CASE WHEN nullif(c_acctbal, c_acctbal) IS NULL THEN 1 ELSE 0 END AS always_one
    FROM customer
    """,
)
def q_fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.when(F.nullif(F.col("c_acctbal"), F.col("c_acctbal")).isNull(), 1)
        .otherwise(0)
        .alias("always_one"),
    )


# Array HOFs over the embeddings table. The fold accumulator is DOUBLE
# on both sides (f32 values promote exactly to f64, left-to-right), so
# sums agree bit-for-bit before the defensive ROUND.
@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           embedding[1] AS first_dim,
           round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vec_sum,
           round(list_max(CAST(embedding AS DOUBLE[])), 4) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_dim"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        F.round(F.array_max(dbl), 4).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
    )


# JSON-string props parsed to MapType; keys/values surfaced as scalar
# columns so the oracle (DuckDB json fns) can recompute them.
@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, F.lit("k")).alias("k_value"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json(F.col("props"), schema).getField("k").alias("k_num"),
    )


@query(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand_x2,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           left(p_type, 3) AS type3,
           right(p_type, 3) AS type_last3
    FROM part
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.instr("p_name", "a").alias("first_a"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.substring(F.col("p_type"), -3, 3).alias("type_last3"),
    )


@query(
    "q_fn_date2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_last_day,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def q_fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months(F.col("o_orderdate"), 3).cast("timestamp").alias("plus_3m"),
        F.last_day("o_orderdate").cast("string").alias("month_last_day"),
        # Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# --------------------------------------------------------------- §2.10 ----
@query(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id, CAST(2 * length(text) + n_chars AS BIGINT) AS score
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return doc_score_pandas_udf(docs)


@query(
    "q_udaf",
    oracle="""
    SELECT user_id,
           round(SUM(value * w)
                 / SUM(CASE WHEN value IS NOT NULL THEN w END), 6) AS wavg
    FROM (SELECT user_id, value,
                 CAST((event_id % 7) + 1 AS DOUBLE) AS w
          FROM events)
    GROUP BY user_id
    """,
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return weighted_avg_grouped_agg(ev)


@query(
    "q_udtf",
    oracle="""
    SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lang, unnest(str_split(text, ' ')) AS word FROM documents)
    GROUP BY lang, word
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = words_udtf(docs)
    return words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS z
    FROM events
    """,
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return zscore_applyinpandas(ev)


@query(
    "q_udf_arrow",
    oracle="""
    SELECT o_orderkey,
           lower(o_orderstatus) || ':' ||
           CASE WHEN o_totalprice >= 200000 THEN 'big' ELSE 'small' END
             AS order_label
    FROM orders
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.functions.udfs import priority_label_arrow_udf

    o = load_table(spark, sf_dir, "orders")
    return priority_label_arrow_udf(o)


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT)  AS k_and,
           CAST(l_orderkey | 4096 AS BIGINT) AS k_or,
           CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT) AS k_xor,
           CAST(CAST(l_linenumber AS BIGINT) << 4 AS BIGINT) AS ln_shl,
           CAST(l_orderkey >> 3 AS BIGINT)   AS k_shr,
           CAST(bit_count(l_orderkey) AS INT) AS k_bits
    FROM lineitem
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (&, |, ^, shifts, popcount) — the bit
    twiddling partition/bucket/bloom logic is built from."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.expr("l_orderkey & 255").alias("k_and"),
        F.expr("l_orderkey | 4096").alias("k_or"),
        F.expr("l_orderkey ^ CAST(l_linenumber AS BIGINT)").alias("k_xor"),
        F.expr("shiftleft(CAST(l_linenumber AS BIGINT), 4)").alias("ln_shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("k_shr"),
        F.bit_count("l_orderkey").alias("k_bits"),
    )


# ANSI-safe arithmetic: Spark 4 runs ANSI mode (overflow/div-0 THROW);
# the try_ family returns NULL instead — the survival kit for dirty
# data at scale. The oracle spells out the same null semantics.
@query(
    "q_fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity / (l_linenumber - 1) AS DOUBLE)
           END AS qty_per_prev,
           CASE WHEN l_quantity BETWEEN -128 AND 127
                THEN CAST(l_quantity AS TINYINT) ELSE NULL
           END AS qty_i8,
           CASE WHEN l_shipdate IS NULL THEN NULL
                ELSE CAST(l_shipdate AS DATE) END AS ship_day
    FROM lineitem
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias(
            "qty_per_prev"
        ),
        F.col("l_quantity").try_cast("tinyint").alias("qty_i8"),
        F.col("l_shipdate").try_cast("date").alias("ship_day"),
    )


# The sorted head is emitted as a canonical integer-string join
# (floor(x*1e6+0.5), exact double arithmetic, identical on both
# engines) rather than a raw array<double> column: float-array cell
# formatting differs between engines/transports (numpy repr vs list
# repr), which would make the driver's value hash depend on
# serialization instead of semantics.
@query(
    "q_fn_array2",
    oracle="""
    SELECT vec_id,
           array_to_string(list_transform(
             list_sort(CAST(embedding[1:4] AS DOUBLE[])),
             x -> CAST(CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS VARCHAR)),
             ',') AS head_sorted,
           CAST(list_position(list_transform(embedding, x -> x > 0),
                              true) AS INT) AS first_pos_idx,
           list_contains(list_transform(embedding, x -> x > 0.25),
                         true) AS has_big,
           round(list_sum(CAST(list_reverse(
                 CAST(embedding[1:3] AS DOUBLE[])) AS DOUBLE[])), 4)
             AS rev_head_sum
    FROM embeddings
    """,
)
def q_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dbl_head = F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double"))
    rev3 = F.reverse(F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double")))
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.sort_array(dbl_head),
                lambda x: F.floor(x * 1000000 + 0.5).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("head_sorted"),
        F.array_position(
            F.transform("embedding", lambda x: x > 0), F.lit(True)
        ).cast("int").alias("first_pos_idx"),
        F.array_contains(
            F.transform("embedding", lambda x: x > 0.25), F.lit(True)
        ).alias("has_big"),
        F.round(
            F.aggregate(rev3, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("rev_head_sum"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into an
    open-schema Variant, then typed variant_get extraction — the
    modern alternative to fixed-schema from_json for evolving event
    properties. DuckDB twin extracts the same path via its JSON type."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_variant"),
        F.variant_get(F.try_parse_json(F.col("props")), "$.k", "string").alias("k_str"),
        (F.variant_get(v, "$.k", "bigint") % 7).alias("k_mod"),
    )


# Third-tier §2.8: the regex function family (extract / replace /
# count / split_part / substring_index) over the Java-regex ∩ RE2
# common subset, so both engines match identically. split_part /
# substring_index use literal delimiters (no regex) — direct twins.
@query(
    "q_fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '[a-z]+', 0) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           split_part(p_type, ' ', 2) AS type_word2,
           array_to_string((str_split(p_name, ' '))[1:2], ' ') AS name_head2,
           CASE WHEN regexp_matches(p_type, '^[a-z]+ ') THEN 1 ELSE 0 END
             AS starts_lower_word
    FROM part
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), "[a-z]+", 0).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "*").alias("devoweled"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("n_vowels"),
        # Spark split_part is 1-based like DuckDB
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_word2"),
        F.substring_index(F.col("p_name"), " ", 2).alias("name_head2"),
        F.regexp_like(F.col("p_type"), F.lit("^[a-z]+ ")).cast("int").alias(
            "starts_lower_word"
        ),
    )


# SQL-callable Python table function (CREATE/registered UDTF +
# LATERAL correlation) — the §2.10 surface the mapInPandas UDTF
# doesn't cover. Arrow-serialized; the oracle replays the n-gram
# lateral as an unnest.
@query(
    "q_udtf_lateral",
    oracle="""
    WITH words AS (
      SELECT doc_id, str_split(text, ' ') AS ws FROM documents
    ), grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(ws[i:i+1], ' ') AS gram
      FROM words, LATERAL unnest(range(1, greatest(len(ws) - 1, 0) + 1)) AS t(i)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           MIN(gram) AS first_gram
    FROM grams GROUP BY doc_id
    """,
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.functions.udfs import register_ngrams_udtf

    register_ngrams_udtf(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_src")
    return spark.sql(
        """
        SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               MIN(f.gram) AS first_gram
        FROM docs_udtf_src d, LATERAL doc_ngrams(d.text, 2) f
        GROUP BY d.doc_id
        """
    )
