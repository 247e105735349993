#!/usr/bin/env python3
"""Paired A/B for q94_hierarchy_rollup's ancestor closure (VERDICT
r13 #6): pointer doubling that re-derives the WHOLE closure per round
(distinct + full checkpoint + full count — the r13 shape) vs r14's
frontier-only doubling (compose the exact-2^r jump slice with the
accumulated closure; increments are disjoint so no distinct, and the
per-round checkpoint + count touch only the NEW pairs).

Identity is asserted first (full (node, anc) pair sets equal), then
reps alternate A/B in one session so a contention spike hits both
arms. Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/r14_ab_q94_closure.py [-n 6]
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
from gpu_olap_engine_spark.queries.tables import T, dsum  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def closure_old(edges, max_rounds=20):
    cl = (
        edges.select(F.col("node"), F.col("parent").alias("anc"))
        .filter(F.col("node") != F.col("anc"))
        .distinct()
        .localCheckpoint()
    )
    n = cl.count()
    for _ in range(max_rounds):
        hop = (
            cl.alias("a")
            .join(cl.alias("b"), F.col("a.anc") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.anc").alias("anc"))
        )
        grown = cl.unionByName(hop).distinct().localCheckpoint()
        m = grown.count()
        if m == n:
            break
        cl, n = grown, m
    return cl


def closure_new(edges, max_rounds=20):
    from gpu_olap_engine_spark.operators.graph import ancestor_closure

    return ancestor_closure(edges)


def q94_with(spark, sf_dir: str, closure) -> None:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    edges = o.filter(F.col("o_orderkey") > 0).select(
        F.col("o_orderkey").alias("node"),
        F.expr("o_orderkey div 3").alias("parent"),
    )
    pairs = closure(edges).unionByName(
        o.select(
            F.col("o_orderkey").alias("node"),
            F.col("o_orderkey").alias("anc"),
        )
    )
    out = (
        pairs.filter(F.col("anc") < 40)
        .join(o, pairs.node == o.o_orderkey)
        .groupBy(F.col("anc").alias("node"))
        .agg(
            F.count("*").alias("subtree_size"),
            dsum("o_totalprice", "subtree_total"),
        )
    )
    out.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--reps", type=int, default=6)
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

    o = T(spark, sf_dir, "orders").select("o_orderkey")
    edges = o.filter(F.col("o_orderkey") > 0).select(
        F.col("o_orderkey").alias("node"),
        F.expr("o_orderkey div 3").alias("parent"),
    )
    a = {(r["node"], r["anc"]) for r in closure_old(edges).collect()}
    b = {(r["node"], r["anc"]) for r in closure_new(edges).collect()}
    assert a == b, f"closure mismatch: {len(a)} vs {len(b)} pairs"
    print(f"identity ok: {len(a)} closure pairs", file=sys.stderr)

    runs: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(args.reps):
        for name, fn in (("old", closure_old), ("new", closure_new)):
            t0 = time.perf_counter()
            q94_with(spark, sf_dir, fn)
            runs[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir,
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
