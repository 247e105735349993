#!/usr/bin/env python3
"""Paired A/B for q165_kcore_peel: checkpoint the per-round survivor
set `keep` before the two semi-joins consume it. The formatted plan of
one peel round shows ZERO ReusedExchange — the degree aggregate over
the full edge relation executes TWICE per round (once per semi-join),
i.e. (rounds) extra O(|E|) aggregations at scale. keep is |V|-sized
(small), so an eager localCheckpoint is a cheap materialization that
halves the per-round aggregate work. Identity checked first."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def kcore(spark, sf_dir, ckpt_keep: bool):
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
    for _ in range(4):
        deg = (
            e.select(F.col("a").alias("nd"))
            .unionAll(e.select(F.col("b").alias("nd")))
            .groupBy("nd")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 3).select("nd")
        if ckpt_keep:
            keep = keep.localCheckpoint(eager=True)
        e = (
            e.join(keep.withColumnRenamed("nd", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("nd", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("nd"))
        .unionAll(e.select(F.col("b").alias("nd")))
        .groupBy("nd")
        .agg(F.count("*").alias("core_deg"))
        .select(F.col("nd").alias("part"), "core_deg")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "5"))
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
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    a = {(r["part"], r["core_deg"])
         for r in kcore(spark, sf_dir, False).collect()}
    b = {(r["part"], r["core_deg"])
         for r in kcore(spark, sf_dir, True).collect()}
    assert a == b, "mismatch"
    print(json.dumps({"identity": "ok", "n": len(a)}), flush=True)

    runs: dict[str, list[float]] = {"dup_keep": [], "ckpt_keep": []}
    for _ in range(reps):
        for name, flag in (("dup_keep", False), ("ckpt_keep", True)):
            t0 = time.monotonic()
            kcore(spark, sf_dir, flag).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        k: {"runs": v, "min": min(v)} for k, v in runs.items()
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
