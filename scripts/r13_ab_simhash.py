#!/usr/bin/env python3
"""In-process alternating A/B: simhash word-hash as a broadcast
dimension (current) vs hashed inline on the (id, word, cnt) relation
(one scan, no distinct, no broadcast join). Also verifies row identity."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators import dedup as D  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T, spread  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def simhash_inline(df, id_col, text_col):
    words = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(D.tokenize(F.col(text_col))).alias("word"),
    )
    wc = words.groupBy("id", "word").agg(F.count("*").alias("cnt"))
    wch = wc.withColumn(
        "h", D.base_hash(F.col("word")) % F.lit(2**D.SIMHASH_BITS)
    )
    per_doc = wch.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1 = 1"), F.col("cnt")).otherwise(
                    -F.col("cnt")
                )
            ).alias(f"s{b}")
            for b in range(D.SIMHASH_BITS)
        ]
    )
    packed = None
    for b in range(D.SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return per_doc.select("id", packed.cast("long").alias("simhash"))


def main() -> None:
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
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    variants = [
        ("cur", lambda: registry["dedup_simhash"].fn(spark, sf_dir)),
        (
            "inline",
            lambda: simhash_inline(
                T(spark, sf_dir, "documents"), "doc_id", "text"
            ),
        ),
    ]
    reps = int(os.environ.get("AB_REPS", "6"))
    runs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _rep in range(reps):
        for name, build in variants:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"runs": r, "min": min(r)} for n, r in runs.items()}))
    cur = registry["dedup_simhash"].fn(spark, sf_dir)
    alt = simhash_inline(T(spark, sf_dir, "documents"), "doc_id", "text").select(
        F.col("id").alias("doc_id"), "simhash"
    )
    diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print(f"identity inline vs cur: diff_rows={diff}")
    spark.stop()


if __name__ == "__main__":
    main()
