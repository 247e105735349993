#!/usr/bin/env python3
"""1-billion-row group-by point (round-11, VERDICT r10 #5).

BASELINE.md's aggregation row is quoted at 1B rows (reference GPU
1.9 s; DuckDB 12.8 s published, hardware unstated). The per-round
bench measures the 100M-row twin (0.53 s ~ 189M rows/s) because a 1B
DuckDB control (~80-90 s/rep on this box, extrapolating its 100M rate)
would eat the driver's 480 s wall budget; this script measures the 1B
shape honestly — same generated shape, same noop-sink protocol, and
the DuckDB control run on the SAME cores — so the two-measurements-
on-one-box comparison exists at the baseline's own scale instead of
an extrapolation. Run manually; results recorded in BENCH_NOTES.md /
BENCH_SCALE.md.

Shape (the bench's micro_groupby_agg_100m at 10x):
  range(1e9) -> groupBy(id % 100_000) -> count(*), sum(id)
Working set: 1e9 longs ~ 8 GB input-side, 100k groups x 2 aggregates;
partial aggregation collapses map-side, so the exchange carries only
32 x 100k partial rows — the plan a 1000-executor cluster wants.

Usage: python3 scripts/bench_groupby_1b.py   # prints ONE JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000_000
REPS = 4  # rep 1 pays lazy first-touch; min-of-reps is the number


def spark_side() -> list[float]:
    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.config import EngineConfig
    from gpu_olap_engine_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # codegen warmup on the small twin
    spark.range(1_000_000).groupBy((F.col("id") % 100).alias("k")).agg(
        F.count("*"), F.sum("id")
    ).write.format("noop").mode("overwrite").save()
    df = spark.range(N, numPartitions=256).groupBy(
        (F.col("id") % 100_000).alias("k")
    ).agg(F.count("*").alias("c"), F.sum("id").alias("s"))
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    return runs


def duckdb_side() -> list[float]:
    import duckdb

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    con.execute("SET preserve_insertion_order=false")
    con.sql(
        "SELECT count(*) FROM (SELECT range % 100 AS k, count(*) c, "
        "sum(range) s FROM range(1000000) GROUP BY k)"
    ).fetchall()  # allocator warmup
    sql = (
        f"SELECT count(*) AS c FROM (SELECT range % 100000 AS k, "
        f"count(*) AS cnt, sum(range) AS s FROM range({N}) GROUP BY k)"
    )
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        runs.append(round(time.perf_counter() - t0, 3))
    con.close()
    return runs


def main() -> None:
    spark_runs = spark_side()
    duck_runs = duckdb_side()
    best = min(spark_runs)
    out = {
        "metric": "groupby_agg_1b",
        "value": best,
        "unit": "sec",
        "rows_per_sec": round(N / best),
        "spark_runs": spark_runs,
        "duckdb_control_runs": duck_runs,
        "duckdb_control": min(duck_runs),
        "n": N,
        "baseline": {"gpu_sec": 1.9, "duckdb_published_sec": 12.8},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
