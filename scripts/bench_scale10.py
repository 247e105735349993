#!/usr/bin/env python3
"""Second-decade scale point: sf0.1 -> ~sf10 (100x) for the blocked
dedup/ANN family only.

BENCH_SCALE.md's ~sf1 suite shows the candidate-generating operators
sub-linear at 10x; this script adds the 100x point so the claim spans
two decades. Only `documents` and `embeddings` are generated (the
three suite queries read nothing else), with the same derivation
rules as scripts/bench_scale.py but collision-free at K=100:

- documents: replica i > 0 REPLACES every 3rd word with the
  replica-unique token r<i>. Rotation (the ~sf1 recipe) is NOT enough
  here: a cyclic word shift preserves almost every shingle, so at
  K=100 every document would sit in a 100-clone near-dup clique —
  ~300M true pairs, and a minhash run measures the clique explosion
  (measured: 393 s), not engine scaling. Word replacement drives
  cross-replica shingle Jaccard to ~0 (every 3-gram window crosses a
  replaced position and the replacement token differs per replica)
  while planted near-dup pairs inside each replica survive, so
  near-dup density stays linear in corpus size — the realistic 100x
  shape;
- embeddings: per-dimension perturbation ((i*31 + j) % 101 - 50) *
  0.002 — 101 prime keeps the perturbation pattern distinct for every
  replica, so no exact-duplicate vectors are planted.

Usage: python3 scripts/bench_scale10.py [--keep]
Prints ONE JSON line. Dataset dir is $SPARK_GRAFT_SCALE10_DIR
(default /tmp/spark_graft_sf10), reused when already complete.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries import load_all
from gpu_olap_engine_spark.queries.tables import T
from gpu_olap_engine_spark.session import get_spark

K = 100
KEY_OFFSET = 1_000_000_000

SUITE = [
    "dedup_minhash_lsh",
    "dedup_span_stats",
    "sim_bucketed_ann",
    "dedup_exact_key",
    # r9 widening (round-8 verdict #5): the rest of the blocked-dedup
    # family, the redesigned Gram-verify path, a text scan, and one
    # TPC-H aggregate shape (lineitem is generated below for it)
    "dedup_simhash",
    "dedup_lines_keep_first",
    "sim_near_dup_pairs",
    "text_token_stats",
    "q77_tpch_q1",
]


def generate(spark, src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = T(spark, src_dir, "documents")
    doc_parts = []
    for i in range(K):
        words = F.split(F.col("text"), r"\s+")
        # every 3rd word -> replica-unique token (see module docstring)
        replaced = F.array_join(
            F.zip_with(
                words,
                F.sequence(F.lit(0), F.size(words) - 1),
                lambda w, j: F.when(j % 3 == 0, F.lit(f"r{i}")).otherwise(w),
            ),
            " ",
        )
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
            .withColumn("text", replaced if i else F.col("text"))
        )
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = T(spark, src_dir, "embeddings")

    def _perturb(i: int):
        def fn(x, j):
            return (
                x + ((F.lit(i * 31) + j) % 101 - F.lit(50)) * F.lit(0.002)
            ).cast("float")

        return fn

    emb_parts = []
    for i in range(K):
        pert = F.transform(F.col("embedding"), _perturb(i))
        emb_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * KEY_OFFSET))
            .withColumn("embedding", pert if i else F.col("embedding"))
        )
    out = emb_parts[0]
    for p in emb_parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    # lineitem for the TPC-H shape (60M rows at K=100): key-offset
    # replicas, same rule as scripts/bench_scale.py
    li = T(spark, src_dir, "lineitem")
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_OFFSET))
        for i in range(K)
    ]
    out = li_parts[0]
    for p in li_parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    with open(f"{out_dir}/_COMPLETE", "w") as f:
        f.write("ok\n")


def main() -> None:
    src_dir = "/root/testdata/sf0.1"
    out_dir = os.environ.get("SPARK_GRAFT_SCALE10_DIR", "/tmp/spark_graft_sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"}
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    # lineitem joined the dataset in r9: a kept r8 dir without it must
    # regenerate
    if not os.path.exists(f"{out_dir}/_COMPLETE") or not os.path.exists(
        f"{out_dir}/lineitem.parquet"
    ):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        generate(spark, src_dir, out_dir)
        gen_s = round(time.perf_counter() - t0, 1)
    else:
        gen_s = 0.0

    registry = load_all()
    timings: dict[str, float] = {}
    for name in SUITE:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name].fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    print(
        json.dumps(
            {
                "metric": "scale10_suite_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 10.0,
                "generate_sec": gen_s,
            }
        )
    )
    spark.stop()
    if "--keep" not in sys.argv:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
