#!/usr/bin/env python3
"""Micro-attribution for one k-means iteration: how much of the 1.5-3 s
per iteration is (a) driver-side analysis/planning, (b) execution —
and does a compact HOF form (one transform over a literal
array-of-centroids instead of k separate _sq_l2 trees) change either?

The compact form is semantically identical: same per-element
arithmetic, same left-to-right aggregate fold, same (d, ci) struct
sort with ties to the lowest index — only the expression TREE shrinks
from O(k*dim) nodes to O(1) lambdas over array literals."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators import similarity as S  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def compact_nearest(vec, centroids):
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    structs = F.transform(
        carr,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.cast("long").alias("ci"),
        ),
    )
    return F.array_sort(structs).getItem(0).getField("ci").cast("long")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    emb = T(spark, sf_dir, "embeddings")
    init = emb.orderBy("vec_id").limit(8).select("embedding").collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    dim = len(centroids[0])
    q = 1_000_000

    def one_iter(nearest_fn):
        assigned = emb.select(
            F.col("embedding").alias("v"),
            nearest_fn(F.col("embedding"), centroids).alias("c"),
        )
        return assigned.groupBy("c").agg(
            F.count("*").alias("n"),
            *[
                F.sum(
                    F.floor(F.element_at("v", i + 1).cast("double") * q).cast("long")
                ).alias(f"s{i}")
                for i in range(dim)
            ],
        )

    out = {}
    for _rep in range(3):
        for name, fn in (("old", S._nearest_centroid), ("compact", compact_nearest)):
            t0 = time.perf_counter()
            df = one_iter(fn)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # force analysis+planning
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = df.collect()
            t_exec = time.perf_counter() - t0
            out.setdefault(f"{name}_build", []).append(round(t_build, 3))
            out.setdefault(f"{name}_plan", []).append(round(t_plan, 3))
            out.setdefault(f"{name}_exec", []).append(round(t_exec, 3))
            out.setdefault(f"{name}_rows", []).append(len(rows))

    # value parity probe: assignments row-for-row
    a = emb.select("vec_id", S._nearest_centroid(F.col("embedding"), centroids).alias("c")).collect()
    b = emb.select("vec_id", compact_nearest(F.col("embedding"), centroids).alias("c")).collect()
    same = {r["vec_id"]: r["c"] for r in a} == {r["vec_id"]: r["c"] for r in b}
    print(json.dumps({k: v for k, v in out.items()}))
    print(json.dumps({"assignments_identical": same}))
    spark.stop()


if __name__ == "__main__":
    main()
