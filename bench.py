#!/usr/bin/env python3
"""Benchmark the headline queries; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Queries execute to completion via the noop sink (full pipeline runs,
no driver-collect overhead), matching how the reference's throughput
numbers were framed (engine time, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries import load_all
from gpu_olap_engine_spark.session import get_spark

HEADLINE = [
    "q01_filter_project_topk",
    "q02_groupby_aggregates",
    "q03_join_agg_topk",
    "q05_star_join_having",
    "q08_join_full",
    "q11_count_distinct",
    "q12_date_extract_agg",
    "q13_arith_in_agg",
    "q14_sort_multi_direction",
    "q20_window_rank",
    "q31_json_extract",
    "q32_tumbling_window",
    "q33_sessionize",
    "q34_asof_join",
    "q35_pivot",
    "q37_pandas_udf_scalar",
    "q39_apply_in_pandas",
    "q43_tpch_q6_shape",
    "q50_hypertable_rollup",
    "q53_dataset_split",
    "q54_sequence_packing",
    "q57_window_analytics",
    "dedup_exact_key",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_bruteforce_topk",
    "sim_bucketed_ann",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "mm_inventory",
    "mm_decode_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # JVM/codegen warmup on the smallest fixture
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Micro-benchmarks matching the reference's two published shapes
    # (BASELINE.md: int-key inner join, group-by aggregate) plus
    # filter+scan, on generated data so the scale is meaningful:
    #   micro_groupby_agg  : 100M rows -> 1M groups (count+sum)
    #   micro_join_int     : 10M x 10M inner equi-join on int64
    #   micro_filter_scan  : 100M rows, modulo predicate
    from pyspark.sql import functions as F  # noqa: PLC0415

    def micro(label, df):
        # min of two runs: single-shot timings on a shared box are
        # noisy at this scale; min is the standard throughput estimate
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[label] = round(min(runs), 3)

    r = spark.range(100_000_000, numPartitions=64)
    micro(
        "micro_groupby_agg_100m",
        r.groupBy((F.col("id") % 100_000).alias("k")).agg(
            F.count("*").alias("c"), F.sum("id").alias("s")
        ),
    )
    a = spark.range(10_000_000, numPartitions=32).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000_000, numPartitions=32).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    micro("micro_join_int_10m_x_10m", a.join(b, "k").select(F.count("*").alias("c")))
    # skewed join: half the probe rows share ONE key; AQE skew-join
    # splits the hot partition at runtime (the case the reference's
    # hash-scatter radix partitioner cannot handle)
    sk = spark.range(20_000_000, numPartitions=32).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(1_000_000, numPartitions=8).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("d")
    )
    micro(
        "micro_join_skewed_50pct",
        sk.join(dim.hint("merge"), "k").select(F.count("*").alias("c")),
    )
    micro(
        "micro_filter_scan_100m",
        r.filter((F.col("id") % 7) == 0).agg(F.count("*").alias("c")),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
