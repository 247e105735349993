"""Materialized continuous aggregates (hypertable rollup flow).

q50 proves the math (hour totals composed from minute partials match
direct computation exactly); this module is the I/O pattern around it:
materialize the finest layer once, partitioned for pruning, and serve
every coarser granularity from it without touching raw events again.
At 100 TB the raw table is petabyte-scale and cold; the minute layer
is ~5 orders of magnitude smaller and hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUANT = 10_000  # value-sum quantization (floor(v*1e4), decimal-summed)


def build_minute_rollup(events: DataFrame) -> DataFrame:
    """Finest-granularity layer: per (minute, event_type) counts and
    quantized value sums. Integer partials -> every coarser rollup
    composed from this layer is EXACTLY equal to recomputation from
    raw events (q50's oracle-proven property)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    minute = ((us - us % 60_000_000) / 1_000_000).cast("long")
    return events.groupBy(
        minute.alias("minute_start"), "event_type"
    ).agg(
        F.count("*").alias("cnt"),
        # decimal partials: exact past int64 (a hot minute x type can
        # outgrow 2^63 at corpus scale) and still algebraic -- coarser
        # layers add the same exact integers in any order.
        F.sum(F.floor(F.col("value") * QUANT).cast("decimal(20,0)")).alias(
            "qv"
        ),
    )


def materialize_minute_rollup(events: DataFrame, path: str) -> None:
    """Write the minute layer partitioned by day — downstream range
    queries prune at the directory level."""
    day = (F.col("minute_start") - F.col("minute_start") % 86_400).alias("day")
    build_minute_rollup(events).withColumn("day", day).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)


def serve_rollup(
    spark: SparkSession, path: str, granularity_s: int
) -> DataFrame:
    """Any coarser granularity from the materialized minute layer:
    (bucket_start, event_type, cnt, sum_value). No raw-event scan."""
    m = spark.read.parquet(path)
    bucket = (
        F.col("minute_start") - F.col("minute_start") % granularity_s
    ).alias("bucket_start")
    return m.groupBy(bucket, "event_type").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        (F.sum("qv").cast("double") / QUANT).alias("sum_value"),
    )
