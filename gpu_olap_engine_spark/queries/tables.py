"""Shared helpers for query implementations.

Cross-engine determinism rules (Spark result must value-hash equal to
the DuckDB oracle's):

* Floating-point SUM/AVG depend on accumulation order, which differs
  between engines (and between runs under AQE). We therefore aggregate
  doubles through exact DECIMAL arithmetic and cast the final value
  back to DOUBLE — bit-identical on both engines. A double is never
  exactly halfway between two DECIMAL(,4) values, so the initial cast
  rounds identically everywhere.
* Computed integers are cast to BIGINT on both sides (Spark ``year()``
  is 32-bit, DuckDB's is 64-bit).
* Timestamps in output are converted to epoch seconds (BIGINT) where
  practical to dodge datetime unit mismatches.
* Every ORDER BY ... LIMIT has a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan: Catalyst pushes
    filters and prunes columns into it (verified in tests/test_plans).

    events.ts is parquet TIMESTAMP(NANOS), which Spark rejects outright
    (PARQUET_TYPE_ILLEGAL); it is read as an int64 of nanoseconds
    (nanosAsLong) and truncated to a microsecond TimestampType — the
    same truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


import itertools as _itertools

# itertools.count is atomic under the GIL — a bare `global n; n += 1`
# is a read-modify-write that can hand two concurrently-executing
# query callables the same view name.
_VIEW_SEQ = _itertools.count(1)


def _view(df: DataFrame, prefix: str) -> str:
    """Register df as a uniquely-named temp view and return the name.

    SQL-string queries need views; unique names make query callables
    safe under concurrent execution in one shared session (the
    driver's prerogative)."""
    name = f"_goe_{prefix}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    Small-file inputs (one parquet file == one partition) serialize
    CPU-heavy derivations like shingling or vector scoring onto a
    single core; a cheap shuffle of the narrow input rows unlocks full
    parallelism. At 100 TB inputs arrive in thousands of splits and
    this becomes a no-op choice — callers use it only ahead of
    compute-bound, per-row-expensive stages.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dsum(c: str | Column, alias: str, scale: int = 4) -> Column:
    """Exact SUM over doubles: decimal-accumulate, emit double.

    Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,scale))) AS DOUBLE).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(c: str | Column, alias: str, scale: int = 4) -> Column:
    """Exact AVG: decimal sum cast to double, divided by count.

    Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,scale))) AS DOUBLE)
                 / COUNT(x).
    """
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)
    ).alias(alias)


def o_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of dsum (SQL fragment, unaliased)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of davg (SQL fragment, unaliased)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
