#!/usr/bin/env python3
"""Scale-up bench: sf0.1 fixtures replicated 10x (~sf1, 6M lineitem)
to exercise multi-GB shuffles; times a representative query subset.

The driver's fixtures stop at sf0.1; this script derives a ~sf1
dataset from them (deterministically — no RNG) so the 100 TB design
claims get at least one order-of-magnitude scale check per round:

- fact tables (orders/lineitem): replicated with key offsets, so join
  fan-outs stay realistic (10x orders per customer, same lines/order);
- events: replicated with user_id/event_id offsets (10x users over
  the same time range — windows/sessionization grow in groups, not
  in per-group length);
- documents: word-rotated per replica (same language stats, but
  cross-replica shingle overlap drops, so near-dup structure stays
  planted-pairs-per-replica instead of exploding into clone cliques);
- embeddings: per-dimension deterministic perturbation per replica
  (cosine(clone, original) < 1, so ANN candidate sets scale linearly).

Usage: python3 scripts/bench_scale.py [--keep]
Prints ONE JSON line; writes nothing into the repo. Dataset dir is
$SPARK_GRAFT_SCALE_DIR (default /tmp/spark_graft_sf1) and is reused
if it already exists (delete it to regenerate).
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

K = 10  # replication factor: sf0.1 -> ~sf1
KEY_OFFSET = 1_000_000_000  # per-replica key stride, far above any fixture key

COPY_TABLES = ("region", "nation", "supplier", "part", "customer")

SUITE = [
    "q01_filter_project_topk",
    "q02_groupby_aggregates",
    "q03_join_agg_topk",
    "q05_star_join_having",
    "q08_join_full",
    "q11_count_distinct",
    "q12_date_extract_agg",
    "q14_sort_multi_direction",
    "q32_tumbling_window",
    "q33_sessionize",
    "q34_asof_join",
    "q43_tpch_q6_shape",
    "q50_hypertable_rollup",
    "q53_dataset_split",
    "q54_sequence_packing",
    "q72_sequence_packing_sharded",
    "q57_window_analytics",
    "dedup_exact_key",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_span_stats",
    "text_token_stats",
    "text_quality_score",
    "sim_bucketed_ann",
    # round-5 additions: the TPC-H compositions with the heaviest
    # join/agg structure, and the rollup-merge maintenance shape
    "q77_tpch_q1",
    "q80_tpch_q5",
    "q84_tpch_q18",
    "q89_incremental_rollup_merge",
    # continuation additions: line-granular dedup (segment-keyed
    # election + reassembly) and the RANGE-frame rolling window
    "dedup_lines_keep_first",
    "q97_rolling_time_window",
    "q103_tpch_q8",
    # continuation-session heavy shapes: the Python-boundary sketch
    # path, both time-series fills, and the downsampler
    "text_heavy_hitters_sketch",
    "q117_gapfill_interpolate",
    "q118_downsample_lttb",
    "q121_time_weighted_avg",
]


def _replicas(spark, src, n_cols_offset):
    """Union K copies of `src`, applying per-replica column offsets.
    n_cols_offset: dict col -> True (offset by i*KEY_OFFSET)."""
    parts = []
    for i in range(K):
        df = src
        for c in n_cols_offset:
            df = df.withColumn(c, F.col(c) + F.lit(i * KEY_OFFSET))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate(spark, src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_TABLES:
        # dimensions keep their cardinality: a 10x fact scale-up with
        # fixed dims is the realistic shape (and keeps joins broadcast)
        shutil.copy(f"{src_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")

    orders = T(spark, src_dir, "orders")
    _replicas(spark, orders, ["o_orderkey"]).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/orders.parquet")

    lineitem = T(spark, src_dir, "lineitem")
    _replicas(spark, lineitem, ["l_orderkey"]).repartition(64).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")

    events = T(spark, src_dir, "events")
    _replicas(spark, events, ["event_id", "user_id"]).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/events.parquet")

    docs = T(spark, src_dir, "documents")
    doc_parts = []
    for i in range(K):
        rot = i * 7 % 50 + 1
        words = F.split(F.col("text"), r"\s+")
        rotated = F.array_join(
            F.concat(
                F.slice(words, rot + 1, 1_000_000), F.slice(words, 1, rot)
            ),
            " ",
        )
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
            .withColumn("text", rotated if i else F.col("text"))
        )
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = T(spark, src_dir, "embeddings")

    def _perturb(i: int):
        def fn(x, j):
            return (
                x + ((F.lit(i * 31) + j) % 7 - F.lit(3)) * F.lit(0.01)
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
    out.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    with open(f"{out_dir}/_COMPLETE", "w") as f:
        f.write("ok\n")


def main() -> None:
    src_dir = "/root/testdata/sf0.1"
    out_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        # -Xlog:disable: JVM unified logging (GC warnings) writes to
        # stdout and would corrupt the one-line JSON contract.
        EngineConfig(
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"}
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/_COMPLETE"):
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
        for _ in range(2):  # min-of-2: shared-box noise dominates
            t0 = time.perf_counter()
            registry[name].fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "scale_suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": 1.0,
                "generate_sec": gen_s,
            }
        )
    )
    spark.stop()
    if "--keep" not in sys.argv:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
