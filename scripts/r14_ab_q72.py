#!/usr/bin/env python3
"""Paired A/B for q72_sequence_packing_sharded (VERDICT r13 #2): the
r13 FUSED single exchange — repartition("lang","shard") carrying text,
tokenize after, so tokenize parallelism is capped at n_lang x 8
non-empty hash groups — vs the r12 SPREAD shape: round-robin spread to
defaultParallelism carries the tokenize at full width, then a second,
NARROW exchange (doc_id, lang, shard, n_tokens — no text) establishes
the window partitioning.

The scale question: at 100 TB with a dominant language the fused shape
serializes ~1/40th of the corpus per task; the spread shape pays one
extra exchange but it moves only ~32 bytes/row. Run at sf10
(SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf10) per the verdict; identity
asserted first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators.dedup import base_hash, tokenize  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T, spread  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def q72_shape(spark, sf_dir: str, fused: bool):
    docs = T(spark, sf_dir, "documents")
    n_tok = F.size(tokenize(F.col("text"))).cast("long")
    shard = (base_hash(F.col("text")) % 8).cast("long")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if fused:
        toks = (
            docs.select("doc_id", "lang", "text", shard.alias("shard"))
            .repartition("lang", "shard")
            .select("doc_id", "lang", "shard", n_tok.alias("n_tokens"))
        )
    else:
        toks = spread(
            docs.select("doc_id", "lang", "text")
        ).select(
            "doc_id", "lang", shard.alias("shard"), n_tok.alias("n_tokens")
        )
    packed = toks.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return packed.groupBy(
        "lang",
        "shard",
        F.floor(F.col("start_offset") / 4096).cast("long").alias("context_bin"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--reps", type=int, default=5)
    ap.add_argument("--skip-identity", action="store_true")
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

    if not args.skip_identity:
        a = {
            tuple(r)
            for r in q72_shape(spark, sf_dir, fused=True).collect()
        }
        b = {
            tuple(r)
            for r in q72_shape(spark, sf_dir, fused=False).collect()
        }
        assert a == b, f"row-set mismatch: {len(a)} vs {len(b)}"
        print(f"identity ok: {len(a)} rows", file=sys.stderr)

    runs: dict[str, list[float]] = {"fused": [], "spread": []}
    for _ in range(args.reps):
        for name, fused in (("fused", True), ("spread", False)):
            t0 = time.perf_counter()
            q72_shape(spark, sf_dir, fused).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir,
        "cpus": cpus,
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
