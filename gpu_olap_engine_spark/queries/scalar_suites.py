"""Scalar-function suites: arrays, maps/JSON, structs, strings,
datetime, null-handling.

The reference's entire scalar surface is +,-,*,/ and comparisons on
int64 (executor.rs:411-441); list/struct/map types are rejected
outright (schema_utils.rs:29-33). These suites document the full
surface this engine exposes, each with a cross-engine-deterministic
oracle. Function-name differences between Spark and DuckDB are mapped
per expression (e.g. array_min ~ list_aggregate 'min',
dayofweek off-by-one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T


@register(
    "q44_array_ops",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           array_to_string(list_slice(words, 1, 3), ',') AS first3,
           CAST(list_contains(words, 'the') AS BIGINT) AS has_the,
           CAST(len(list_distinct(words)) AS BIGINT) AS n_unique,
           list_aggregate(words, 'min') AS min_word,
           list_aggregate(words, 'max') AS max_word
    FROM w
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: size/slice/contains/distinct/min/max over a
    computed array column — the type class the reference cannot even
    represent (schema_utils.rs:29-33)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.concat_ws(",", F.slice(words, 1, 3)).alias("first3"),
        F.array_contains(words, "the").cast("long").alias("has_the"),
        F.size(F.array_distinct(words)).cast("long").alias("n_unique"),
        F.array_min(words).alias("min_word"),
        F.array_max(words).alias("max_word"),
    )


@register(
    "q45_map_from_json",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id < 100
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse JSON into map<string,string>, read keys
    and values (from_json / map_keys / element_at)."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
        F.element_at(m, "k").cast("long").alias("k_value"),
    )


@register(
    "q46_struct_first_order",
    oracle="""
    SELECT o_custkey,
           CAST(MIN(o_orderkey) FILTER (
               WHERE (o_orderdate, o_orderkey) = first_pair
           ) AS BIGINT) AS first_orderkey,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_orderdate
    FROM (
        SELECT *, MIN((o_orderdate, o_orderkey)) OVER (PARTITION BY o_custkey)
                   AS first_pair
        FROM orders
    )
    GROUP BY o_custkey
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: earliest order per customer via lexicographic
    struct min — sort_array(collect_list(struct(date, key)))[0] in
    Spark, a struct-valued window MIN in the oracle. Structs order
    field-by-field in both engines, so the tie-break is identical."""
    orders = T(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    first = F.sort_array(F.collect_list(pair)).getItem(0)
    return (
        orders.groupBy("o_custkey")
        .agg(first.alias("f"))
        .select(
            "o_custkey",
            F.col("f.o_orderkey").cast("long").alias("first_orderkey"),
            F.date_format(F.col("f.o_orderdate"), "yyyy-MM-dd").alias(
                "first_orderdate"
            ),
        )
    )


@register(
    "q47_string_suite",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           lpad(c_mktsegment, 12, '_') AS seg_padded,
           reverse(c_mktsegment) AS seg_rev,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           concat(lower(c_mktsegment), ':', upper(substring(c_name, 1, 4)))
               AS combo,
           CAST(length(trim(c_name)) AS BIGINT) AS name_len
    FROM customer WHERE c_custkey < 200
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function suite: regexp_extract / lpad / reverse / instr /
    concat / case conversions — all impossible on FNV-1a-hashed
    strings (record_batch_convert.rs:112-130)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("name_num"),
        F.lpad("c_mktsegment", 12, "_").alias("seg_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.concat(
            F.lower("c_mktsegment"), F.lit(":"), F.upper(F.substring("c_name", 1, 4))
        ).alias("combo"),
        F.length(F.trim(F.col("c_name"))).cast("long").alias("name_len"),
    )


@register(
    "q48_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_95,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders WHERE o_orderkey < 500
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime suite: extraction, truncation, arithmetic, diffs.
    Engine-mapping notes: Spark dayofweek is 1-based Sunday, DuckDB
    0-based (oracle adds 1); dates serialize as yyyy-MM-dd strings to
    dodge datetime-unit mismatches."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).cast("long").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_95"
        ),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "q49_null_funcs",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           CAST(nullif(o_orderstatus, 'O') IS NULL AS BIGINT) AS is_open,
           greatest(o_totalprice, 250000.0) AS price_floor_250k,
           least(o_totalprice, 250000.0) AS price_cap_250k
    FROM orders WHERE o_orderkey < 500
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling functions: nullif/coalesce/greatest/least and
    IS NULL — three-valued logic the reference's sentinel scheme
    cannot express."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    v = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.coalesce(v, F.lit("open")).alias("status_or_open"),
        v.isNull().cast("long").alias("is_open"),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("price_floor_250k"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("price_cap_250k"),
    )
