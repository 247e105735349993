#!/usr/bin/env python3
"""q165_kcore_peel survivor-set A/B at arbitrary SF (VERDICT r13 #5).

Per peel round the degree aggregate feeds `keep`, which both semi-
joins consume — with nothing materialized the aggregate executes
TWICE per round (0 ReusedExchange; plans/r13). r13 measured an eager
localCheckpoint of keep as a LOSS at sf0.1 (3.60 -> 4.33s: the
blocking barrier outweighed the duplicate aggregate) with an explicit
caveat that the boundary may flip at sf1. This harness re-runs that
A/B at any SF and adds a third arm: keep.persist() — lazy caching, no
barrier; the first semi-join materializes it, the second reads the
cache.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/r14_ab_kcore_keep.py [-n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def kcore(spark, sf_dir: str, mode: str):
    li = T(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    e = (
        op.alias("a")
        .join(
            op.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("a"), F.col("b.pk").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = []
    for _ in range(4):
        deg = (
            e.select(F.col("a").alias("nd"))
            .unionAll(e.select(F.col("b").alias("nd")))
            .groupBy("nd")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 3).select("nd")
        if mode == "ckpt":
            keep = keep.localCheckpoint(eager=True)
        elif mode == "persist":
            keep = keep.persist()
            kept.append(keep)
        e = (
            e.join(keep.withColumnRenamed("nd", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("nd", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    out = (
        e.select(F.col("a").alias("nd"))
        .unionAll(e.select(F.col("b").alias("nd")))
        .groupBy("nd")
        .agg(F.count("*").alias("core_deg"))
        .select(F.col("nd").alias("part"), "core_deg")
    )
    out.write.format("noop").mode("overwrite").save()
    for k in kept:
        k.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--reps", type=int, default=4)
    ap.add_argument("--modes", default="none,ckpt,persist")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            extra_confs={
                "spark.ui.enabled": "false",
                "spark.sql.ui.retainedExecutions": "4",
            }
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    modes = args.modes.split(",")
    runs: dict[str, list[float]] = {m: [] for m in modes}
    for _ in range(args.reps):
        for m in modes:
            t0 = time.perf_counter()
            kcore(spark, sf_dir, m)
            runs[m].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir,
        "cpus": cpus,
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
